"""Golden-value tests for diffusion math vs. independent torch recomputation
of the reference formulas (SURVEY.md section 4 seams: beta schedules,
compute_alpha, eps-loss, antithetic sampling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wavedm_tpu.diffusion.loss import antithetic_timesteps, noise_estimation_loss
from wavedm_tpu.diffusion.schedules import (
    alpha_bars,
    compute_alpha,
    ddim_timesteps,
    get_beta_schedule,
)


@pytest.mark.parametrize("name", ["linear", "quad", "const", "jsd", "sigmoid"])
def test_beta_schedules_golden(name):
    T = 1000
    betas = get_beta_schedule(name, beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=T)
    assert betas.shape == (T,)
    assert betas.dtype == np.float64
    # independent recomputation (torch mirrors the reference's numpy math)
    if name == "linear":
        exp = torch.linspace(1e-4, 0.02, T, dtype=torch.float64).numpy()
    elif name == "quad":
        exp = (torch.linspace(1e-2, 0.02 ** 0.5, T, dtype=torch.float64) ** 2).numpy()
    elif name == "const":
        exp = np.full(T, 0.02)
    elif name == "jsd":
        exp = 1.0 / np.linspace(T, 1, T)
    else:  # sigmoid
        xs = np.linspace(-6, 6, T)
        exp = 1 / (1 + np.exp(-xs)) * (0.02 - 1e-4) + 1e-4
    np.testing.assert_allclose(betas, exp, rtol=1e-12)


def test_linear_schedule_endpoints():
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=1000)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)


def test_compute_alpha_matches_reference_semantics():
    # reference (utils/sampling.py:10-13): prepend 0 to betas, cumprod(1-b),
    # index at t+1 -> t=-1 gives exactly 1.
    betas = jnp.asarray(get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100
    ), dtype=jnp.float32)
    t = jnp.array([-1, 0, 10, 99])
    a = np.asarray(compute_alpha(betas, t))
    b = np.asarray(betas, dtype=np.float64)
    ref = np.concatenate([[1.0], np.cumprod(1 - b)])[t + 1]
    np.testing.assert_allclose(a, ref, rtol=1e-5)
    assert a[0] == 1.0


def test_alpha_bars_monotone():
    betas = jnp.asarray(get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=1000
    ), dtype=jnp.float32)
    ab = np.asarray(alpha_bars(betas))
    assert ab[0] == 1.0
    assert np.all(np.diff(ab) < 0)


def test_ddim_timesteps():
    seq = ddim_timesteps(1000, 25)
    assert len(seq) == 25
    assert seq[0] == 0 and seq[-1] == 960 and seq[1] - seq[0] == 40


def test_antithetic_timesteps_distribution():
    key = jax.random.PRNGKey(0)
    t = np.asarray(antithetic_timesteps(key, 8, 1000))
    assert t.shape == (8,)
    assert (t >= 0).all() and (t < 1000).all()
    # mirrored pairs: t[i + ceil(n/2)] == T - 1 - t[i] for surviving entries
    half = 8 // 2 + 1
    for i in range(8 - half):
        assert t[half + i] == 1000 - 1 - t[i]


def test_noise_estimation_loss_vs_torch():
    """Cross-check the full eps-loss against an independent torch
    recomputation of the reference formula (models/ddm_wavelet.py:108-124),
    using a linear 'model' so both sides evaluate identically."""
    rng = np.random.default_rng(3)
    B, H, W = 4, 8, 8
    inp_c, pred_c, other_c = 6, 3, 3
    C = inp_c + pred_c + other_c
    x0 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    e = rng.standard_normal((B, H, W, pred_c)).astype(np.float32)
    t = np.array([0, 10, 50, 99])
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=100).astype(np.float32)

    # "model": returns mean over channels of input, broadcast to pred_c — any
    # deterministic function works; it must see [cond | xt | other].
    def jmodel(x, tf):
        return jnp.repeat(jnp.mean(x, axis=-1, keepdims=True), pred_c, axis=-1)

    out = noise_estimation_loss(
        jmodel, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(e),
        jnp.asarray(betas), inp_channels=inp_c, pred_channels=pred_c,
        use_other_channels=True)

    # torch recomputation (NCHW like the reference)
    tx0 = torch.from_numpy(x0).permute(0, 3, 1, 2)
    te = torch.from_numpy(e).permute(0, 3, 1, 2)
    tb = torch.from_numpy(betas)
    tt = torch.from_numpy(t)
    a = (1 - tb).cumprod(dim=0).index_select(0, tt).view(-1, 1, 1, 1)
    x_inp = tx0[:, :inp_c]
    x_tar = tx0[:, inp_c:inp_c + pred_c]
    xt = x_tar * a.sqrt() + te * (1 - a).sqrt()
    x_other = tx0[:, inp_c + pred_c:]
    x = torch.cat([xt, x_other], dim=1)
    minp = torch.cat([x_inp, x], dim=1)
    toutput = minp.mean(dim=1, keepdim=True).repeat(1, pred_c, 1, 1)
    x0_pred = (xt - toutput * (1 - a).sqrt()) / a.sqrt()
    simple = (te - toutput).square().sum(dim=(1, 2, 3)).mean()
    mse = (x_tar - x0_pred).square().sum(dim=(1, 2, 3)).mean()

    np.testing.assert_allclose(float(out.simple_loss), float(simple), rtol=1e-5)
    np.testing.assert_allclose(float(out.mse_loss), float(mse), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.e_pred), toutput.permute(0, 2, 3, 1).numpy(), atol=1e-5)
