"""End-to-end restoration pipeline test on a tiny wavelet config: the full
cond->DWT->HFRM->tiled DDIM->recombine->IWT chain must produce finite [0,1]
images and track the reference's output-selection semantics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavedm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig, SamplingConfig
from wavedm_tpu.inference.restoration import DiffusiveRestoration
from wavedm_tpu.models.hfrm import HFRM
from wavedm_tpu.models.unet import DiffusionUNet


def tiny_cfg() -> Config:
    cfg = Config()
    cfg.data = DataConfig(image_size=8, patch_size=32, wavelet=True)
    cfg.model = ModelConfig(
        in_channels=48, out_ch=3, pred_channels=3, use_other_channels=True,
        other_channels_begin=3, ch=32, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(), dropout=0.0)
    cfg.diffusion = DiffusionConfig(num_diffusion_timesteps=20)
    cfg.sampling = SamplingConfig(sampling_timesteps=5, grid_r=4,
                                  x0_pred_index=-1)
    return cfg.validate()


@pytest.fixture(scope="module")
def pipeline():
    cfg = tiny_cfg()
    key = jax.random.PRNGKey(0)
    unet = DiffusionUNet.from_config(cfg)
    uparams = unet.init(key, jnp.zeros((1, 8, 8, 96)), jnp.zeros((1,)))["params"]
    hfrm = HFRM(dim=8, mid_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
    hparams = hfrm.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
    restorer = DiffusiveRestoration(
        cfg, unet.apply, uparams, hfrm.apply, hparams)
    return cfg, restorer


def test_restore_image_shapes_and_range(pipeline, rng):
    cfg, restorer = pipeline
    # 48x64 pixel image -> 12x16 wavelet domain, patches 8, r=4
    cond = rng.random((48, 64, 3)).astype(np.float32)
    out, hfrm_out = restorer.restore_image(cond)
    assert out.shape == (1, 48, 64, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_restore_deterministic_with_rng(pipeline, rng):
    cfg, restorer = pipeline
    cond = rng.random((48, 64, 3)).astype(np.float32)
    a, _ = restorer.restore_image(cond, jax.random.PRNGKey(7))
    b, _ = restorer.restore_image(cond, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(a, b)
    c, _ = restorer.restore_image(cond, jax.random.PRNGKey(8))
    assert np.abs(a - c).max() > 0  # init noise differs


def test_restore_metrics_loop(pipeline, rng):
    cfg, restorer = pipeline
    pairs = []
    for i in range(2):
        pair = rng.random((48, 64, 6)).astype(np.float32)
        pairs.append((pair, f"img{i}"))
    res = restorer.restore(pairs)
    assert res["n_images"] == 2
    for k in ("psnr_torch", "psnr_y", "psnr_np_y", "ssim"):
        assert np.isfinite(res[k]), res


def test_x0_pred_index_changes_output(pipeline, rng):
    cfg, restorer = pipeline
    cond = rng.random((48, 64, 3)).astype(np.float32)
    a, _ = restorer.restore_image(cond, jax.random.PRNGKey(0))

    cfg2 = dataclasses.replace(
        cfg, sampling=dataclasses.replace(cfg.sampling, x0_pred_index=-3))
    r2 = DiffusiveRestoration(cfg2, restorer.unet_apply, restorer.unet_params,
                              restorer.hfrm_apply, restorer.hfrm_params)
    b, _ = r2.restore_image(cond, jax.random.PRNGKey(0))
    assert np.abs(a - b).max() > 0


def test_whole_image_mode(pipeline, rng):
    """sampling.whole_image runs the non-tiled generalized_steps chain
    (reference utils/sampling.py:23-44) with reflect-pad to the UNet's
    divisibility; at a single-patch geometry it must equal the tiled
    sampler's final x_t (at eta=0, abar[0]=1 makes x_final == x0_preds[-1],
    so tiled x0_pred_index=-1 is the same tensor)."""
    import copy

    cfg, _ = pipeline
    key = jax.random.PRNGKey(0)
    unet = DiffusionUNet.from_config(cfg)
    uparams = unet.init(key, jnp.zeros((1, 8, 8, 96)), jnp.zeros((1,)))["params"]
    hfrm = HFRM(dim=8, mid_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
    hparams = hfrm.init(key, jnp.zeros((1, 32, 32, 3)))["params"]

    # 32x32 pixels -> 8x8 wavelet domain == patch size -> K=1 tile
    cond = rng.random((32, 32, 3)).astype(np.float32)
    r_tiled = DiffusiveRestoration(cfg, unet.apply, uparams,
                                   hfrm.apply, hparams)
    out_tiled, _ = r_tiled.restore_image(cond, jax.random.PRNGKey(7))

    cfg_w = copy.deepcopy(cfg)
    cfg_w.sampling.whole_image = True
    r_whole = DiffusiveRestoration(cfg_w, unet.apply, uparams,
                                   hfrm.apply, hparams)
    out_whole, _ = r_whole.restore_image(cond, jax.random.PRNGKey(7))
    np.testing.assert_allclose(out_whole, out_tiled, atol=1e-5)

    # non-divisible geometry exercises the reflect-pad path (the reference
    # whole-image path crashes there): 40x56 pixels -> 10x14 wavelet domain,
    # ch_mult (1,2) needs /2
    cond2 = rng.random((40, 56, 3)).astype(np.float32)
    out2, _ = r_whole.restore_image(cond2)
    assert out2.shape == (1, 40, 56, 3)
    assert np.isfinite(out2).all()
    assert out2.min() >= 0.0 and out2.max() <= 1.0


def test_restore_eval_batching_matches_per_image_count(pipeline, rng):
    """eval_batch groups same-geometry samples into one fused program;
    metrics stay per-image and the count is exact (incl. the tail batch
    and a geometry change mid-stream)."""
    cfg, restorer = pipeline
    pairs = [
        (rng.random((32, 32, 6)).astype(np.float32), "a"),
        (rng.random((32, 32, 6)).astype(np.float32), "b"),
        (rng.random((32, 32, 6)).astype(np.float32), "c"),
        (rng.random((48, 64, 6)).astype(np.float32), "d"),  # new geometry
    ]
    res = restorer.restore(iter(pairs), eval_batch=2)
    assert res["n_images"] == 4
    assert np.isfinite(res["psnr_torch"])
    assert np.isfinite(res["ssim"])
