"""Truncated refinement sampling (``sampling.t_start`` / ``sampling.init_ll``).

TPU-build extension generalizing the reference's ``begin_from_noise: false``
(models/ddm.py:361-365 noises the conditioning to t=T-1, which at T=1000 is
indistinguishable from pure noise -- the reference's own comment reads
"not use noise to start, not work", models/ddm_wavelet.py:444).  Here the
chain runs over [0, t_start) from an LL estimate noised to a(t_start) --
motivated by the measured high-t failure of eps-parameterized conditional
restoration (see tools/diag_teacher_forced.py and README "Quality loop").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavedm_tpu.config import Config, ConfigError, config_from_dict
from wavedm_tpu.diffusion.sampling import make_overlapping_sampler
from wavedm_tpu.diffusion.schedules import get_beta_schedule
from wavedm_tpu.inference.restoration import DiffusiveRestoration


def _mini_cfg(**sampling):
    raw = {
        "data": {"image_size": 8, "patch_size": 32, "wavelet": True},
        "model": {"ch": 8, "ch_mult": [1, 2], "num_res_blocks": 1,
                  "attn_resolutions": [4]},
        "sampling": dict({"sampling_timesteps": 5}, **sampling),
        "hfrm": {"dim": 4, "enc_blk_nums": [1, 1], "middle_blk_num": 1,
                 "dec_blk_nums": [1, 1]},
    }
    return config_from_dict(raw)


def test_config_validation():
    cfg = _mini_cfg(t_start=300, init_ll="hfrm")
    assert cfg.sampling.t_start == 300
    with pytest.raises(ConfigError):
        _mini_cfg(t_start=1000)          # >= num_diffusion_timesteps
    with pytest.raises(ConfigError):
        _mini_cfg(t_start=-1)
    with pytest.raises(ConfigError):
        _mini_cfg(init_ll="bogus")
    with pytest.raises(ConfigError):
        # hfrm init needs the wavelet path
        config_from_dict({
            "data": {"wavelet": False, "image_size": 32, "patch_size": 32},
            "sampling": {"t_start": 100, "init_ll": "hfrm"},
        })


def _restorer(cfg):
    # model fns are never called in these seq/init unit tests
    return DiffusiveRestoration(cfg, lambda *a, **k: None, None,
                                lambda *a, **k: None, {})


def test_truncated_seq():
    r = _restorer(_mini_cfg(t_start=200, sampling_timesteps=10))
    np.testing.assert_array_equal(r.seq, np.arange(0, 200, 20))
    # default: full reference chain
    r0 = _restorer(_mini_cfg(sampling_timesteps=25))
    np.testing.assert_array_equal(r0.seq, np.arange(0, 1000, 40))


def test_init_chain_state_levels():
    cfg = _mini_cfg(t_start=200, sampling_timesteps=10, init_ll="hfrm")
    r = _restorer(cfg)
    base = jnp.full((1, 4, 4, 3), 2.0)
    noise = jnp.ones((1, 4, 4, 3))
    abar = jnp.cumprod(1.0 - r.betas)
    a_s = abar[int(r.seq[-1])]
    got = r._init_chain_state(base, noise)
    want = base * jnp.sqrt(a_s) + noise * jnp.sqrt(1.0 - a_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    # t_start=0 + begin_from_noise=True reproduces pure noise
    cfg0 = _mini_cfg()
    r0 = _restorer(cfg0)
    np.testing.assert_array_equal(
        np.asarray(r0._init_chain_state(base, noise)), np.asarray(noise))

    # t_start=0 + begin_from_noise=False: reference full-T noising
    cfg_bfn = _mini_cfg()
    cfg_bfn.data.begin_from_noise = False
    rb = _restorer(cfg_bfn)
    a_T = abar[-1]
    want = base * jnp.sqrt(a_T) + noise * jnp.sqrt(1.0 - a_T)
    np.testing.assert_allclose(
        np.asarray(rb._init_chain_state(base, noise)), np.asarray(want),
        rtol=1e-6)


def test_init_base_ll_selection():
    cond = jnp.zeros((1, 4, 4, 48)) + 1.0
    hfrm = jnp.zeros((1, 4, 4, 48)) + 2.0
    r = _restorer(_mini_cfg(t_start=200, init_ll="hfrm"))
    np.testing.assert_array_equal(np.asarray(r._init_base_ll(cond, hfrm)),
                                  np.asarray(hfrm[..., :3]))
    r = _restorer(_mini_cfg(t_start=200, init_ll="cond"))
    np.testing.assert_array_equal(np.asarray(r._init_base_ll(cond, hfrm)),
                                  np.asarray(cond[..., :3]))
    r = _restorer(_mini_cfg(t_start=200, init_ll="noise"))
    assert r._init_base_ll(cond, hfrm) is None


def test_truncated_chain_analytic_recovery():
    """With the analytic eps model, a truncated chain started from the
    noised TARGET recovers it (the refinement contract: starting near the
    answer and denoising [0, t_start) must not move away from it)."""
    h, w, p, r_ = 24, 32, 16, 8
    rng = np.random.default_rng(3)
    x_tar = jnp.asarray(rng.standard_normal((1, h, w, 2)).astype(np.float32) * 2)
    T, t_start, steps = 1000, 300, 10
    betas = jnp.asarray(get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02,
        num_diffusion_timesteps=T), jnp.float32)
    abar = jnp.concatenate([jnp.ones(1), jnp.cumprod(1 - betas)])
    seq = np.arange(0, t_start, t_start // steps, dtype=np.int32)

    def perfect_model(x, t):
        xt = x[..., 2:4]
        tar = x[..., 0:2]  # cond channels carry the local target window
        a = abar[t[0].astype(jnp.int32) + 1]
        return (xt - jnp.sqrt(a) * tar) / jnp.sqrt(1.0 - a)

    sampler = make_overlapping_sampler(
        perfect_model, image_shape=(h, w), patch_size=p, grid_r=r_,
        seq=seq, betas=betas, pred_channels=2)
    a_s = abar[int(seq[-1]) + 1]
    noise = jax.random.normal(jax.random.PRNGKey(0), x_tar.shape)
    x_init = x_tar * jnp.sqrt(a_s) + noise * jnp.sqrt(1.0 - a_s)
    xf, x0s = sampler(x_init, x_tar)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(x_tar),
                               atol=5e-3, rtol=1e-3)
