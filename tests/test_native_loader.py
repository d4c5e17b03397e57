"""Native C++ data loader tests: decode parity with PIL, crop-batch
assembly, determinism, and error paths."""

import os

import numpy as np
import pytest

from wavedm_tpu.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(),
    reason="libwavedm_data.so not built (make -C native/dataloader)")


@pytest.fixture(scope="module")
def image_pair(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    arr = (rng.random((40, 64, 3)) * 255).astype(np.uint8)
    gt = np.clip(arr.astype(np.int32) + 10, 0, 255).astype(np.uint8)
    paths = {}
    for name, a in (("rain.png", arr), ("clean.png", gt)):
        p = str(d / name)
        Image.fromarray(a).save(p)
        paths[name] = (p, a)
    jp = str(d / "rain.jpg")
    Image.fromarray(arr).save(jp, quality=95)
    paths["rain.jpg"] = (jp, arr)
    return paths


def test_decode_png_matches_pil(image_pair):
    path, arr = image_pair["rain.png"]
    out = native_loader.decode_image(path)
    assert out.shape == (40, 64, 3)
    np.testing.assert_allclose(out, arr.astype(np.float32) / 255.0, atol=1e-6)


def test_decode_jpeg_close_to_pil(image_pair):
    from PIL import Image
    path, _ = image_pair["rain.jpg"]
    out = native_loader.decode_image(path)
    ref = np.asarray(Image.open(path), dtype=np.float32) / 255.0
    assert out.shape == ref.shape
    # libjpeg IDCT may differ from PIL by a few levels
    assert np.abs(out - ref).max() < 0.05


def test_crop_batch_layout_and_determinism(image_pair):
    pi, arr_i = image_pair["rain.png"]
    pg, arr_g = image_pair["clean.png"]
    b1 = native_loader.make_crop_batch([pi], [pg], patch_n=4, patch=16, seed=7)
    b2 = native_loader.make_crop_batch([pi], [pg], patch_n=4, patch=16, seed=7)
    np.testing.assert_array_equal(b1, b2)
    assert b1.shape == (4, 16, 16, 6)
    # cond/gt channel split must hold the +10/255 offset everywhere
    diff = b1[..., 3:] - b1[..., :3]
    assert (diff >= 0).all()
    # crops must be actual windows of the source image
    full = arr_i.astype(np.float32) / 255.0
    crop0 = b1[0, ..., :3]
    found = False
    for y in range(40 - 16 + 1):
        for x in range(64 - 16 + 1):
            if np.allclose(full[y:y + 16, x:x + 16], crop0, atol=1e-6):
                found = True
                break
        if found:
            break
    assert found, "crop is not a window of the source image"


def test_crop_batch_different_seeds_differ(image_pair):
    pi, _ = image_pair["rain.png"]
    pg, _ = image_pair["clean.png"]
    b1 = native_loader.make_crop_batch([pi], [pg], patch_n=4, patch=16, seed=1)
    b2 = native_loader.make_crop_batch([pi], [pg], patch_n=4, patch=16, seed=2)
    assert np.abs(b1 - b2).max() > 0


def test_missing_file_raises(image_pair):
    pi, _ = image_pair["rain.png"]
    with pytest.raises(IOError):
        native_loader.make_crop_batch(
            [pi], ["/nonexistent/x.png"], patch_n=1, patch=8, seed=0)
    with pytest.raises(IOError):
        native_loader.decode_image("/nonexistent/x.png")


@pytest.fixture(scope="module")
def coord_pair(tmp_path_factory):
    """Image pair whose pixel values ENCODE their coordinates (R=y, G=x),
    so a crop's top-left corner can be recovered from its first pixel."""
    from PIL import Image

    d = tmp_path_factory.mktemp("coords")
    h, w = 40, 64
    arr = np.zeros((h, w, 3), np.uint8)
    arr[..., 0] = np.arange(h)[:, None]
    arr[..., 1] = np.arange(w)[None, :]
    pi, pg = str(d / "inp.png"), str(d / "gt.png")
    Image.fromarray(arr).save(pi)
    Image.fromarray(arr).save(pg)
    return pi, pg, h, w


def _native_corners(pi, pg, h, w, p, seeds, patch_n=8):
    ys, xs = [], []
    for seed in seeds:
        b = native_loader.make_crop_batch([pi], [pg], patch_n=patch_n,
                                          patch=p, seed=seed)
        ys.extend(np.round(b[:, 0, 0, 0] * 255).astype(int))
        xs.extend(np.round(b[:, 0, 0, 1] * 255).astype(int))
    return np.array(ys), np.array(xs)


def test_crop_rng_statistical_equivalence_with_pil(coord_pair):
    """VERDICT r1 #9: native crop coordinates must match the PIL path's
    statistics -- uniform over the valid window, high diversity -- not just
    decode parity.  Bounds are loose enough to be flake-free (n=400)."""
    pi, pg, h, w, p = *coord_pair, 16
    n_seeds = 50
    ys, xs = _native_corners(pi, pg, h, w, p, seeds=range(n_seeds))
    assert ys.min() >= 0 and ys.max() <= h - p
    assert xs.min() >= 0 and xs.max() <= w - p
    # PIL-path reference statistics from the same number of draws
    rng = np.random.default_rng(0)
    ys_ref = rng.integers(0, h - p + 1, ys.size)
    xs_ref = rng.integers(0, w - p + 1, xs.size)
    # mean within 15% of the window, matching the PIL draw's behavior
    assert abs(ys.mean() - (h - p) / 2) < 0.15 * (h - p), ys.mean()
    assert abs(xs.mean() - (w - p) / 2) < 0.15 * (w - p), xs.mean()
    assert abs(ys.std() - ys_ref.std()) < 0.25 * ys_ref.std()
    assert abs(xs.std() - xs_ref.std()) < 0.25 * xs_ref.std()
    # diversity: most (y,x) pairs distinct (the pre-fix per-slot stream
    # repeated identical coordinates across every batch of an epoch)
    uniq = len({(int(a), int(b)) for a, b in zip(ys, xs)})
    assert uniq > 0.5 * ys.size, uniq


def test_crop_rng_differs_across_batches_within_epoch(coord_pair):
    """The pipeline folds (seed, epoch, batch-start) into the native seed
    (data/raindrop.py): two batch starts must give different crops."""
    pi, pg, h, w = coord_pair
    p, seed, epoch = 16, 61, 0
    base = (seed * 100003 + epoch)
    y0, x0 = _native_corners(pi, pg, h, w, p, seeds=[base * 1000003 + 0])
    y1, x1 = _native_corners(pi, pg, h, w, p, seeds=[base * 1000003 + 1])
    assert not (np.array_equal(y0, y1) and np.array_equal(x0, x1))


def _write_pair_tree(root, h, w, n=2):
    from PIL import Image
    rng = np.random.default_rng(3)
    os.makedirs(os.path.join(root, "input"), exist_ok=True)
    os.makedirs(os.path.join(root, "gt"), exist_ok=True)
    for i in range(n):
        a = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        b = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(a).save(os.path.join(root, "input", f"{i}.png"))
        Image.fromarray(b).save(os.path.join(root, "gt", f"{i}.png"))


def test_eval_sample_native_fast_path_matches_pil(tmp_path):
    """720x480 sources take the native decode path in _eval_sample and must
    be bit-equal to the PIL pipeline (VERDICT r2 item 7: native loader was
    train-only)."""
    from wavedm_tpu.data.raindrop import RainDropDataset
    root = str(tmp_path / "canon")
    _write_pair_tree(root, 480, 720)
    ds = RainDropDataset(root, 256, 1, parse_patches=False)
    pair_native, _ = ds._eval_sample(0)

    import wavedm_tpu.data.native_loader as nl
    orig = nl.available
    nl.available = lambda: False
    try:
        pair_pil, _ = ds._eval_sample(0)
    finally:
        nl.available = orig
    # native decode is v*(1/255.f): 1-ulp from numpy's v/255.0
    np.testing.assert_allclose(pair_native, pair_pil, atol=1e-6)

    # non-canonical source size -> PIL resample path (protocol parity)
    root2 = str(tmp_path / "odd")
    _write_pair_tree(root2, 100, 160)
    ds2 = RainDropDataset(root2, 256, 1, parse_patches=False)
    pair2, _ = ds2._eval_sample(0)
    assert pair2.shape == (480, 720, 6)


def test_folder_full_image_native_fast_path(tmp_path):
    from wavedm_tpu.data.folder import PairedImageFolder
    root = str(tmp_path / "raindrop_f")
    _write_pair_tree(root, 480, 720)
    ds = PairedImageFolder(root, crop=False, resize=False)
    a, b = ds.load_pair(0)

    import wavedm_tpu.data.native_loader as nl
    orig = nl.available
    nl.available = lambda: False
    try:
        a2, b2 = ds.load_pair(0)
    finally:
        nl.available = orig
    np.testing.assert_allclose(a, a2, atol=1e-6)
    np.testing.assert_allclose(b, b2, atol=1e-6)
