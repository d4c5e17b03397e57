"""Pixel-space diffusion path (the reference's configs/raindrop.yml /
models/ddm.py alternative): train step, FFT conditioning, whole-image and
tiled pixel restoration, paired-folder dataset."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavedm_tpu.config import (
    Config,
    DataConfig,
    DiffusionConfig,
    ModelConfig,
    SamplingConfig,
)
from wavedm_tpu.models.unet import DiffusionUNet
from wavedm_tpu.training.state import create_train_state
from wavedm_tpu.training.train_step import make_train_step, prepare_pixel_batch


def pixel_cfg(use_fft: bool = False) -> Config:
    cfg = Config()
    cfg.data = DataConfig(image_size=16, patch_size=16, wavelet=False,
                          channels=3, use_fft=use_fft)
    cfg.model = ModelConfig(
        in_channels=9 if use_fft else 3, out_ch=3, pred_channels=3,
        use_other_channels=False, other_channels_begin=0,
        use_gt_in_train=False, ch=32, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(8,))
    cfg.diffusion = DiffusionConfig(num_diffusion_timesteps=50)
    cfg.sampling = SamplingConfig(sampling_timesteps=4, grid_r=8,
                                  x0_pred_index=-1)
    return cfg.validate()


def test_pixel_train_step_loss_decreases(rng):
    cfg = pixel_cfg()
    model = DiffusionUNet.from_config(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 16, 16, 6)), jnp.zeros((1,)))["params"]
    state = create_train_state(params, cfg.optim, key)
    step = make_train_step(cfg, model.apply, donate=False)
    batch = jnp.asarray(rng.random((4, 16, 16, 6)).astype(np.float32))
    losses = []
    for _ in range(10):
        state, m = step(state, batch)
        losses.append(float(m.loss))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_pixel_fft_train_step_runs(rng):
    cfg = pixel_cfg(use_fft=True)
    assert cfg.model.unet_in_channels == 12  # fft-cond(9) + xt(3)
    model = DiffusionUNet.from_config(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 16, 16, 12)), jnp.zeros((1,)))["params"]
    state = create_train_state(params, cfg.optim, key)
    step = make_train_step(cfg, model.apply, donate=False)
    batch = jnp.asarray(rng.random((2, 16, 16, 6)).astype(np.float32))
    state, m = step(state, batch)
    assert np.isfinite(float(m.loss))


def test_prepare_pixel_batch_fft_channels(rng):
    cfg = pixel_cfg(use_fft=True)
    x = jnp.asarray(rng.random((1, 16, 16, 6)).astype(np.float32))
    out = prepare_pixel_batch(x, cfg)
    assert out.shape[-1] == 12
    cond = 2 * np.asarray(x[..., :3]) - 1
    f = np.fft.fft2(cond, axes=(1, 2))
    np.testing.assert_allclose(np.asarray(out[..., :3]), cond, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[..., 3:6]), np.abs(f),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out[..., 6:9]), np.angle(f),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out[..., 9:]),
                               2 * np.asarray(x[..., 3:]) - 1, atol=1e-6)


def test_pixel_restoration_end_to_end(rng):
    from wavedm_tpu.inference.restoration import DiffusiveRestoration
    cfg = pixel_cfg()
    model = DiffusionUNet.from_config(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 16, 16, 6)), jnp.zeros((1,)))["params"]
    restorer = DiffusiveRestoration(cfg, model.apply, params)
    cond = rng.random((32, 48, 3)).astype(np.float32)
    out, _ = restorer.restore_image(cond)
    assert out.shape == (1, 32, 48, 3)
    assert out.min() >= 0 and out.max() <= 1 and np.isfinite(out).all()


def test_paired_folder_dataset(tmp_path, rng):
    from PIL import Image
    from wavedm_tpu.data.folder import PairedImageFolder

    os.makedirs(tmp_path / "input")
    os.makedirs(tmp_path / "gt")
    for i in range(3):
        arr = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / "input" / f"{i}.png")
        Image.fromarray(255 - arr).save(tmp_path / "gt" / f"{i}.png")

    ds = PairedImageFolder(str(tmp_path), crop=True, resize=True,
                           crop_size=32, resize_size=16)
    assert len(ds) == 3
    a, b = ds.load_pair(0, np.random.default_rng(0))
    assert a.shape == (16, 16, 3) and b.shape == (16, 16, 3)
    batches = list(ds.batches(batch_size=3, epoch=0, seed=1))
    assert batches[0].shape == (3, 16, 16, 6)
    # epoch folded into shuffle: different epochs yield different crops
    b2 = list(ds.batches(batch_size=3, epoch=1, seed=1))
    assert np.abs(batches[0] - b2[0]).max() > 0

    ds2 = PairedImageFolder(str(tmp_path), crop=False, resize=False)
    a2, _ = ds2.load_pair(0)
    assert a2.shape == (40, 60, 3)  # no raindrop in path -> no 720x480 force
