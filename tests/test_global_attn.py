"""End-to-end wiring of ``data.global_attn`` (reference: DiffusionUNet_Global
behind the flag at models/ddm.py:140-143, whole-image ``total`` through the
loss at models/ddm_wavelet.py:222-259 and through the tiled sampler at
utils/sampling.py:80-87 / models/ddm_wavelet.py:481-484, eval threading at
models/restoration.py:76,106)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavedm_tpu.config import Config, ConfigError, config_from_dict
from wavedm_tpu.models.unet_global import AttnGlobal, DiffusionUNetGlobal

pytestmark = pytest.mark.slow  # fast tier: -m 'not slow'


def tiny_global_cfg(**data_over):
    cfg = Config()
    cfg.data = dataclasses.replace(
        cfg.data, image_size=8, patch_size=32, global_attn=True, **data_over)
    cfg.model = dataclasses.replace(
        cfg.model, ch=32, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(4,))
    cfg.training = dataclasses.replace(cfg.training, patch_n=2, batch_size=1)
    cfg.optim = dataclasses.replace(cfg.optim, lr=1e-3)
    cfg.sampling = dataclasses.replace(
        cfg.sampling, sampling_timesteps=3, grid_r=4)
    return cfg.validate()


# ------------------------------------------------------------ model-level

def test_attn_global_broadcast_equivalence(rng):
    """k/v computed once at Bg=1 and token-broadcast must equal the
    reference's semantics of repeating x_global per patch
    (total.repeat(B,1,1,1), utils/sampling.py:483-484)."""
    m = AttnGlobal()
    xp = jnp.asarray(rng.standard_normal((6, 8, 8, 32)).astype(np.float32))
    xg1 = jnp.asarray(rng.standard_normal((1, 16, 16, 32)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), xp, xg1)
    out_b = m.apply(v, xp, xg1)                      # broadcast path
    out_r = m.apply(v, xp, jnp.repeat(xg1, 6, axis=0))  # reference repeat
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_r),
                               atol=1e-5, rtol=1e-5)


def test_attn_global_groupwise_broadcast(rng):
    """Bg=2, B=6: totals repeat per-image across contiguous crop groups --
    the layout train batches use ([img0 crops | img1 crops])."""
    m = AttnGlobal()
    xp = jnp.asarray(rng.standard_normal((6, 8, 8, 32)).astype(np.float32))
    xg = jnp.asarray(rng.standard_normal((2, 16, 16, 32)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), xp, xg)
    out_b = m.apply(v, xp, xg)
    out_r = m.apply(v, xp, jnp.repeat(xg, 3, axis=0))
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_r),
                               atol=1e-5, rtol=1e-5)


# ------------------------------------------------------------- train step

def test_global_train_step_runs_and_learns():
    """Trainer builds the global UNet; batch is (crops, totals); loss is
    finite, decreases, and the global branch receives gradients."""
    from wavedm_tpu.training.trainer import DiffusionTrainer

    cfg = tiny_global_cfg()
    tr = DiffusionTrainer(cfg, use_mesh=False, log_fn=lambda s: None)
    assert isinstance(tr.model, DiffusionUNetGlobal)

    rng = np.random.default_rng(0)
    crops = rng.random((2, 32, 32, 6), dtype=np.float32)
    totals = rng.random((1, 64, 64, 3), dtype=np.float32)
    g0 = np.asarray(tr.state.params["global_conv_in"]["kernel"])
    losses = []
    for _ in range(12):
        tr.state, m = tr.train_step(tr.state, (jnp.asarray(crops),
                                               jnp.asarray(totals)))
        losses.append(float(m.loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    g1 = np.asarray(tr.state.params["global_conv_in"]["kernel"])
    assert np.abs(g1 - g0).max() > 0, "global branch got no gradient"


def test_prepare_global_batch_wavelet_domain():
    """Wavelet path decomposes the total into the UNet's 48-channel domain
    (documented fix: the reference passes raw pixels and crashes)."""
    from wavedm_tpu.training.train_step import prepare_global_batch

    cfg = tiny_global_cfg()
    total = jnp.asarray(np.random.default_rng(1).random(
        (1, 64, 64, 3), dtype=np.float32))
    out = prepare_global_batch(total, cfg)
    assert out.shape == (1, 16, 16, 48)
    cfg_px = Config()
    cfg_px.data = dataclasses.replace(cfg_px.data, wavelet=False,
                                      global_attn=True)
    out_px = prepare_global_batch(total, cfg_px)
    assert out_px.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(out_px),
                               np.asarray(2.0 * total - 1.0))


# ----------------------------------------------------------- tiled sampler

def test_overlapping_sampler_passes_global(rng):
    """The tiled sampler forwards x_global to the model at every step and
    every patch batch."""
    from wavedm_tpu.diffusion.sampling import make_overlapping_sampler
    from wavedm_tpu.diffusion.schedules import get_beta_schedule

    betas = jnp.asarray(get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02,
        num_diffusion_timesteps=20), jnp.float32)
    seen = []

    def fake_model(params, x, t, g):
        seen.append(g.shape)
        # eps estimate influenced by the global tensor's mean
        return x[..., -3:] * 0.1 + jnp.mean(g)

    sampler = make_overlapping_sampler(
        fake_model, image_shape=(16, 16), patch_size=8, grid_r=4,
        seq=np.array([0, 10]), betas=betas, pred_channels=3,
        use_global=True, jit_mode="step")
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((1, 16, 16, 6)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
    x_final, x0 = sampler(x, cond, None, params={}, x_global=g)
    assert x0.shape[0] == 2
    assert np.isfinite(np.asarray(x_final)).all()
    assert seen and all(s == (1, 32, 32, 4) for s in seen)

    # changing x_global must change the output (it is actually consumed)
    x_final2, _ = sampler(x, cond, None, params={}, x_global=g + 1.0)
    assert np.abs(np.asarray(x_final2) - np.asarray(x_final)).max() > 1e-4


# -------------------------------------------------------------- end-to-end

def test_global_restoration_end_to_end():
    """Full wavelet-path restoration with the global UNet: finite output in
    [0,1] at a non-square geometry."""
    from wavedm_tpu.inference.restoration import DiffusiveRestoration
    from wavedm_tpu.models.hfrm import HFRM
    from wavedm_tpu.training.trainer import DiffusionTrainer

    cfg = tiny_global_cfg()
    tr = DiffusionTrainer(cfg, use_mesh=False, log_fn=lambda s: None)
    hfrm = HFRM.from_config(cfg)
    hp = hfrm.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 32, 32, 3)))["params"]
    rest = DiffusiveRestoration(cfg, tr.model.apply, tr.state.params,
                                hfrm.apply, hp)
    img = np.random.default_rng(3).random((64, 96, 3), dtype=np.float32)
    out, _ = rest.restore_image(img)
    assert out.shape == (1, 64, 96, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


# ------------------------------------------------------------------ config

def test_global_attn_config_combos():
    base = {
        "data": {"global_attn": True, "use_window": True},
    }
    with pytest.raises(ConfigError):
        config_from_dict(base)
    with pytest.raises(ConfigError):
        config_from_dict({"data": {"global_attn": True,
                                   "wavelet_in_unet": True}})
    with pytest.raises(ConfigError):
        config_from_dict({"data": {"global_attn": True,
                                   "conditional": False}})
    cfg = config_from_dict(
        {"data": {"global_attn": True}})
    assert cfg.data.global_attn


def test_global_config_file_loads():
    from wavedm_tpu.config import load_config
    cfg = load_config("wavedm_tpu/configs/raindrop_wavelet_global.yaml")
    assert cfg.data.global_attn and cfg.data.wavelet
