"""RainDrop pipeline tests against a small on-disk fixture dataset:
PIL path vs native path, per-host sharding, eval resize rule."""

import os

import numpy as np
import pytest

from wavedm_tpu.config import Config, DataConfig, TrainingConfig
from wavedm_tpu.data.raindrop import RainDrop, RainDropDataset, eval_resize_dims


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("raindrop_data")
    rng = np.random.default_rng(0)
    for split, n in (("train", 6), ("raindrop_test", 2)):
        for sub in ("input", "gt"):
            os.makedirs(root / "raindrop" / split / sub)
        for i in range(n):
            arr = (rng.random((120, 180, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(
                root / "raindrop" / split / "input" / f"{i}_rain.png")
            Image.fromarray(255 - arr).save(
                root / "raindrop" / split / "gt" / f"{i}_clean.png")
    return str(root)


def _cfg(dataset_dir) -> Config:
    cfg = Config()
    cfg.data = DataConfig(image_size=8, patch_size=32, wavelet=True,
                          data_dir=dataset_dir)
    cfg.training = TrainingConfig(patch_n=4, batch_size=2)
    return cfg


def test_train_batches_pil(dataset_dir):
    cfg = _cfg(dataset_dir)
    ds = RainDrop(cfg)
    batches = list(ds.train_batches(epoch=0, use_native=False))
    assert len(batches) == 3  # 6 images / batch_size 2
    assert batches[0].shape == (8, 32, 32, 6)  # 2 * patch_n 4
    assert batches[0].dtype == np.float32
    assert 0.0 <= batches[0].min() and batches[0].max() <= 1.0
    # cond/gt inversion fixture property: cond + gt == 1 (255/255)
    s = batches[0][..., :3] + batches[0][..., 3:]
    np.testing.assert_allclose(s, 1.0, atol=2 / 255)


def test_train_batches_native_matches_shape(dataset_dir):
    from wavedm_tpu.data import native_loader
    if not native_loader.available():
        pytest.skip("native loader not built")
    cfg = _cfg(dataset_dir)
    ds = RainDrop(cfg)
    batches = list(ds.train_batches(epoch=0, use_native=True))
    assert len(batches) == 3
    assert batches[0].shape == (8, 32, 32, 6)
    s = batches[0][..., :3] + batches[0][..., 3:]
    np.testing.assert_allclose(s, 1.0, atol=2 / 255)


def test_epoch_changes_shuffle(dataset_dir):
    cfg = _cfg(dataset_dir)
    ds = RainDrop(cfg)
    b0 = next(iter(ds.train_batches(epoch=0, use_native=False)))
    b1 = next(iter(ds.train_batches(epoch=1, use_native=False)))
    assert np.abs(b0 - b1).max() > 0  # the reference reuses one permutation


def test_process_sharding(dataset_dir):
    cfg = _cfg(dataset_dir)
    d0 = RainDrop(cfg, process_index=0, process_count=2)
    d1 = RainDrop(cfg, process_index=1, process_count=2)
    n0 = sum(1 for _ in d0.train_batches(0, batch_size=1, use_native=False))
    n1 = sum(1 for _ in d1.train_batches(0, batch_size=1, use_native=False))
    assert n0 == 3 and n1 == 3


def test_eval_samples(dataset_dir):
    cfg = _cfg(dataset_dir)
    ds = RainDrop(cfg)
    samples = list(ds.eval_samples())
    assert len(samples) == 2
    pair, img_id = samples[0]
    # canonical eval geometry: 720x480 resize (already /16)
    assert pair.shape == (480, 720, 6)
    assert img_id.endswith("_rain")


def test_eval_resize_rule():
    assert eval_resize_dims(999, 777) == (720, 480)


def test_device_cache_matches_pil_stream_exactly(dataset_dir):
    """data.device_cache yields the SAME batches as the PIL streaming path:
    same shuffle, same per-(seed,epoch,idx) crop RNG, same uint8/255 values
    to within 1 ulp (XLA's divide rounds differently from numpy's) -- only
    the transport changes (one upload + on-device gathers)."""
    cfg = _cfg(dataset_dir)
    ds_pil = RainDrop(cfg)
    pil_batches = list(ds_pil.train_batches(epoch=1, use_native=False,
                                            prefetch=False))

    import copy
    cfg2 = copy.deepcopy(cfg)
    cfg2.data.device_cache = True
    ds_cache = RainDrop(cfg2)
    cache_batches = [np.asarray(b)
                     for b in ds_cache.train_batches(epoch=1)]

    assert len(pil_batches) == len(cache_batches)
    for a, b in zip(pil_batches, cache_batches):
        np.testing.assert_allclose(a, b, atol=1e-7)
    # second epoch reuses the SAME device cache object (one upload total)
    assert ds_cache._cache is not None
    c0 = ds_cache._cache
    _ = list(ds_cache.train_batches(epoch=2))
    assert ds_cache._cache is c0


def test_device_cache_crop_batch_shapes(dataset_dir):
    from wavedm_tpu.data.device_cache import DeviceCropCache

    rng = np.random.default_rng(3)
    pairs = (rng.random((4, 40, 60, 6)) * 255).astype(np.uint8)
    cache = DeviceCropCache(pairs, patch_size=16)
    coords = np.array([[0, 0, 0], [1, 24, 44], [3, 10, 5]], np.int32)
    out = np.asarray(cache.crop_batch(coords))
    assert out.shape == (3, 16, 16, 6)
    np.testing.assert_allclose(out[0], pairs[0, :16, :16] / 255.0, atol=1e-7)
    np.testing.assert_allclose(out[1], pairs[1, 24:40, 44:60] / 255.0,
                               atol=1e-7)


def test_device_cache_rejects_mixed_sizes(tmp_path):
    """ADVICE r2: heterogeneous train images must fail with a ConfigError
    naming the uniform-size requirement, not a bare np.stack crash."""
    from PIL import Image
    import pytest as _pytest
    from wavedm_tpu.config import ConfigError
    from wavedm_tpu.data.device_cache import build_pair_cache

    paths_i, paths_g = [], []
    for i, (h, w) in enumerate([(32, 48), (40, 48)]):
        a = (np.random.default_rng(i).random((h, w, 3)) * 255).astype(np.uint8)
        pi = str(tmp_path / f"i{i}.png")
        pg = str(tmp_path / f"g{i}.png")
        Image.fromarray(a).save(pi)
        Image.fromarray(a).save(pg)
        paths_i.append(pi)
        paths_g.append(pg)
    with _pytest.raises(ConfigError, match="uniform"):
        build_pair_cache(paths_i, paths_g, 16)
