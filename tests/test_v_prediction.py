"""v-prediction (training.pred_type: "v") and min-SNR loss weighting.

The reference is eps-only (models/ddm_wavelet.py:108-124); v-prediction is
the opt-in fix for the measured high-t conditioning failure (an eps model's
target degenerates to x_t at a_t -> 0, so the 25-step full chain never
learns to use the conditioning early on -- see diffusion/loss.py).

Correctness anchors:
  * algebraic identities: a perfect v-model yields zero loss, exact x0 and
    exact implied epsilon;
  * sampler equivalence: converting an eps-model to the equivalent v-model
    leaves the whole DDIM trajectory bit-for-bit identical (whole-image and
    tiled), so pred_type changes the PARAMETERIZATION, never the chain;
  * min-SNR weights match a straight numpy recomputation and reduce to the
    unweighted loss as gamma -> inf (eps) / the (SNR+1)-weighted form (v).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavedm_tpu.config import ConfigError, load_config
from wavedm_tpu.diffusion.loss import noise_estimation_loss
from wavedm_tpu.diffusion.sampling import ddim_sample, make_overlapping_sampler
from wavedm_tpu.diffusion.schedules import ddim_timesteps, get_beta_schedule

BETAS = jnp.asarray(get_beta_schedule(
    "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100
), dtype=jnp.float32)
ABAR = jnp.cumprod(1.0 - BETAS)


def _abar_of(t):
    return ABAR[t.astype(jnp.int32)][:, None, None, None]


def test_perfect_v_model_zero_loss_exact_x0():
    rng = np.random.default_rng(0)
    x_tar = rng.standard_normal((4, 8, 8, 2)).astype(np.float32)
    cond = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    e = rng.standard_normal((4, 8, 8, 2)).astype(np.float32)
    t = jnp.asarray([3, 40, 70, 99])
    x_tar_j, e_j = jnp.asarray(x_tar), jnp.asarray(e)

    def perfect_v(x, tf):
        a = _abar_of(tf)
        xt = x[..., 3:5]  # [cond(3) | xt(2)]
        # v = sqrt(a)e - sqrt(1-a)x0, recovered from xt and the known x0
        return jnp.sqrt(a) * (xt - jnp.sqrt(a) * x_tar_j) / jnp.sqrt(1 - a) \
            - jnp.sqrt(1 - a) * x_tar_j

    out = noise_estimation_loss(
        perfect_v, jnp.concatenate([cond, x_tar], -1), t, e_j, BETAS,
        inp_channels=3, pred_channels=2, use_other_channels=False,
        pred_type="v")
    assert float(out.simple_loss) < 1e-6
    np.testing.assert_allclose(np.asarray(out.x0_pred), x_tar,
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.e_pred), e,
                               atol=1e-4, rtol=1e-4)


def _linear_eps_model(x, t):
    return (0.1 * x[..., :2] + 0.01 * x[..., 2:4]
            + 0.001 * t[:, None, None, None])


def _v_of_eps(model):
    """The v-model algebraically equivalent to an eps-model:
    v = (e - sqrt(1-a) x_t) / sqrt(a)."""
    def v_model(x, t):
        a = _abar_of(t)
        xt = x[..., 2:4]
        return (model(x, t) - jnp.sqrt(1 - a) * xt) / jnp.sqrt(a)
    return v_model


def test_whole_image_chain_invariant_under_reparameterization():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 2)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((2, 8, 8, 2)).astype(np.float32))
    seq = ddim_timesteps(100, 10)
    xf_e, x0_e = ddim_sample(_linear_eps_model, x, cond, seq, BETAS)
    xf_v, x0_v = ddim_sample(_v_of_eps(_linear_eps_model), x, cond, seq,
                             BETAS, pred_type="v")
    np.testing.assert_allclose(np.asarray(xf_v), np.asarray(xf_e),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x0_v), np.asarray(x0_e),
                               atol=1e-4, rtol=1e-4)


def test_tiled_chain_invariant_under_reparameterization():
    rng = np.random.default_rng(2)
    h, w, p, r = 16, 24, 8, 4
    x = jnp.asarray(rng.standard_normal((1, h, w, 2)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((1, h, w, 2)).astype(np.float32))
    seq = ddim_timesteps(100, 5)
    common = dict(image_shape=(h, w), patch_size=p, grid_r=r, seq=seq,
                  betas=BETAS, pred_channels=2)
    s_eps = make_overlapping_sampler(_linear_eps_model, **common)
    s_v = make_overlapping_sampler(_v_of_eps(_linear_eps_model),
                                   pred_type="v", **common)
    xf_e, x0_e = s_eps(x, cond)
    xf_v, x0_v = s_v(x, cond)
    np.testing.assert_allclose(np.asarray(xf_v), np.asarray(xf_e),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x0_v), np.asarray(x0_e),
                               atol=1e-4, rtol=1e-4)


def _loss_at(pred_type, snr_gamma):
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.standard_normal((4, 8, 8, 5)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((4, 8, 8, 2)).astype(np.float32))
    t = jnp.asarray([0, 25, 60, 99])
    out = noise_estimation_loss(
        _linear_eps_model, x0, t, e, BETAS, inp_channels=3, pred_channels=2,
        use_other_channels=False, pred_type=pred_type, snr_gamma=snr_gamma)
    return out, t


def test_min_snr_weights_match_numpy():
    for pred_type in ("eps", "v"):
        gamma = 5.0
        out_w, t = _loss_at(pred_type, gamma)
        out_u, _ = _loss_at(pred_type, 0.0)
        a = np.asarray(ABAR)[np.asarray(t)]
        snr = a / (1 - a)
        w = np.minimum(snr, gamma) / (snr + (1.0 if pred_type == "v" else 0.0))
        # recompute the weighted mean from per-image unweighted terms: the
        # unweighted loss is the mean of per-image sums, so reconstruct them
        rng = np.random.default_rng(3)
        x0 = rng.standard_normal((4, 8, 8, 5)).astype(np.float32)
        e = rng.standard_normal((4, 8, 8, 2)).astype(np.float32)
        a4 = a[:, None, None, None].astype(np.float32)
        x_tar = x0[..., 3:5]
        xt = x_tar * np.sqrt(a4) + e * np.sqrt(1 - a4)
        inp = np.concatenate([x0[..., :3], xt], -1)
        pred = np.asarray(_linear_eps_model(jnp.asarray(inp),
                                            jnp.asarray(t, jnp.float32)))
        if pred_type == "v":
            target = np.sqrt(a4) * e - np.sqrt(1 - a4) * x_tar
        else:
            target = e
        per_img = ((target - pred) ** 2).sum(axis=(1, 2, 3))
        np.testing.assert_allclose(float(out_w.simple_loss),
                                   float((per_img * w).mean()),
                                   rtol=2e-4)
        np.testing.assert_allclose(float(out_u.simple_loss),
                                   float(per_img.mean()), rtol=2e-4)


def test_config_validation():
    cfg = load_config("wavedm_tpu/configs/rehearsal_wavelet.yaml")
    assert cfg.training.pred_type == "eps"  # default preserves the reference
    cfg.training.pred_type = "v"
    cfg.validate()
    cfg.training.pred_type = "x0"
    with pytest.raises(ConfigError):
        cfg.validate()
    cfg.training.pred_type = "v"
    cfg.training.snr_gamma = -1.0
    with pytest.raises(ConfigError):
        cfg.validate()


def test_train_step_runs_with_v_and_snr():
    """One jitted v-pred train step on tiny shapes: finite loss, EMA moves."""
    import dataclasses

    from wavedm_tpu.models.unet import DiffusionUNet
    from wavedm_tpu.training.state import create_train_state
    from wavedm_tpu.training.train_step import make_train_step

    cfg = load_config("wavedm_tpu/configs/rehearsal_wavelet.yaml")
    cfg = dataclasses.replace(cfg)
    cfg.model.ch = 32
    cfg.model.ch_mult = [1, 2]
    cfg.model.attn_resolutions = [8]
    cfg.model.use_gt_in_train = True
    cfg.data.image_size = 16
    cfg.data.patch_size = 64
    cfg.training.pred_type = "v"
    cfg.training.snr_gamma = 5.0
    cfg.validate()
    model = DiffusionUNet.from_config(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 16, 16, 96)),
                        jnp.zeros((1,)))["params"]
    state = create_train_state(params, cfg.optim, key)
    step = make_train_step(cfg, model.apply, donate=False)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 6))
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics.loss))
    assert np.isfinite(float(metrics.mse_loss))
    assert int(new_state.step) == 1


def test_grad_accum_matches_single_pass():
    """grad_accum=2 must reproduce the accum=1 update (same t/e draws, the
    loss is a batch mean, so averaged micro-grads equal the full grad)."""
    import dataclasses

    from wavedm_tpu.models.unet import DiffusionUNet
    from wavedm_tpu.training.state import create_train_state
    from wavedm_tpu.training.train_step import make_train_step

    cfg = load_config("wavedm_tpu/configs/rehearsal_wavelet.yaml")
    cfg = dataclasses.replace(cfg)
    cfg.model.ch = 32
    cfg.model.ch_mult = [1, 2]
    cfg.model.attn_resolutions = [8]
    cfg.model.use_gt_in_train = True
    cfg.data.image_size = 16
    cfg.data.patch_size = 64
    cfg.training.batch_size = 4   # 4 crops per step (patch_n folded in data)
    cfg.validate()
    model = DiffusionUNet.from_config(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 16, 16, 96)),
                        jnp.zeros((1,)))["params"]
    batch = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 6))

    outs = {}
    for accum in (1, 2, 4):
        cfg_a = dataclasses.replace(cfg)
        cfg_a.training.grad_accum = accum
        state = create_train_state(params, cfg_a.optim, key)
        step = make_train_step(cfg_a, model.apply, donate=False)
        new_state, m = step(state, batch)
        outs[accum] = (new_state, m)

    base_state, base_m = outs[1]
    for accum in (2, 4):
        s, m = outs[accum]
        np.testing.assert_allclose(float(m.loss), float(base_m.loss),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m.grad_norm),
                                   float(base_m.grad_norm), rtol=1e-4)
        a = jax.tree_util.tree_leaves(s.params)[0]
        b = jax.tree_util.tree_leaves(base_state.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_grad_accum_validation():
    cfg = load_config("wavedm_tpu/configs/rehearsal_wavelet.yaml")
    cfg.training.grad_accum = 3   # 2*4=8 crops not divisible by 3
    with pytest.raises(ConfigError):
        cfg.validate()
