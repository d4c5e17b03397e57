"""bfloat16 compute path, remat equivalence, and misc coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavedm_tpu.models.unet import DiffusionUNet

pytestmark = pytest.mark.slow  # fast tier: -m 'not slow'


@pytest.fixture(scope="module")
def tiny_unet_setup():
    model = DiffusionUNet(in_channels=6, out_ch=3, ch=32, ch_mult=(1, 2),
                          num_res_blocks=1, attn_resolutions=(8,),
                          resolution=16)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 6))
    t = jnp.array([10.0, 500.0])
    params = model.init(key, x, t)["params"]
    return model, params, x, t


def test_bf16_compute_close_to_f32(tiny_unet_setup):
    model, params, x, t = tiny_unet_setup
    y32 = model.apply({"params": params}, x, t)
    bf = DiffusionUNet(in_channels=6, out_ch=3, ch=32, ch_mult=(1, 2),
                       num_res_blocks=1, attn_resolutions=(8,),
                       resolution=16, compute_dtype=jnp.bfloat16)
    y16 = bf.apply({"params": params}, x, t)
    assert y16.dtype == jnp.float32  # output upcast
    # bf16 activations: ~1e-2 relative agreement on O(1) outputs
    assert float(jnp.abs(y16 - y32).max()) < 0.1
    corr = np.corrcoef(np.asarray(y32).ravel(), np.asarray(y16).ravel())[0, 1]
    assert corr > 0.999


def test_remat_equals_plain(tiny_unet_setup):
    model, params, x, t = tiny_unet_setup
    rem = DiffusionUNet(in_channels=6, out_ch=3, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, attn_resolutions=(8,),
                        resolution=16, remat=True)
    y0 = model.apply({"params": params}, x, t)
    y1 = rem.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)

    # remat gradients must match as well
    def loss(p, mod):
        return jnp.sum(jnp.square(mod.apply({"params": p}, x, t)))

    g0 = jax.grad(loss)(params, model)
    g1 = jax.grad(loss)(params, rem)
    l0 = jax.tree_util.tree_leaves(g0)[0]
    l1 = jax.tree_util.tree_leaves(g1)[0]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-4,
                               atol=1e-5)


def test_whole_image_sampler_on_unet(tiny_unet_setup):
    """ddim_sample (non-tiled, reference generalized_steps) drives the real
    UNet: the sample_validation_patches analog
    (models/ddm_wavelet.py:311-331)."""
    from wavedm_tpu.diffusion.sampling import ddim_sample
    from wavedm_tpu.diffusion.schedules import ddim_timesteps, get_beta_schedule

    model, params, x, t = tiny_unet_setup
    betas = jnp.asarray(get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=50
    ), jnp.float32)
    cond = x[..., :3]
    x_init = jax.random.normal(jax.random.PRNGKey(1), cond.shape)
    xf, x0s = ddim_sample(
        lambda xx, tt: model.apply({"params": params}, xx, tt),
        x_init, cond, ddim_timesteps(50, 5), betas)
    assert xf.shape == cond.shape
    assert x0s.shape[0] == 5
    assert np.isfinite(np.asarray(xf)).all()


def test_wavelet_in_unet_mode(rng):
    """wavelet_in_unet: DWT on entry / IWT on exit (reference
    models/unet.py:203-206,349,393-394): pixel-domain in/out, wavelet-domain
    compute; output shape matches input spatial dims."""
    from wavedm_tpu.models.unet import DiffusionUNet

    m = DiffusionUNet(in_channels=96, out_ch=48, ch=32, ch_mult=(1, 2),
                      num_res_blocks=1, attn_resolutions=(),
                      resolution=16, wavelet_in_unet=True)
    # 64x64 pixel input [cond3|tar3] -> internal 16x16x96 -> output 64x64x3
    x = jnp.asarray(rng.random((1, 64, 64, 6)).astype(np.float32))
    t = jnp.zeros((1,))
    v = m.init(jax.random.PRNGKey(0), x, t)
    y = m.apply(v, x, t)
    assert y.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_bf16_global_unet_close_to_f32():
    """DiffusionUNetGlobal computes in bf16 when asked (dtype threads through
    the global branch and cross-attention too)."""
    from wavedm_tpu.models.unet_global import DiffusionUNetGlobal

    kw = dict(in_channels=6, out_ch=3, ch=32, ch_mult=(1, 2),
              num_res_blocks=1, attn_resolutions=(8,), resolution=16,
              global_channels=3)
    m32 = DiffusionUNetGlobal(**kw)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 6))
    g = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 3))
    t = jnp.zeros((4,))
    params = m32.init(key, x, t, g)["params"]
    y32 = m32.apply({"params": params}, x, t, g)
    m16 = DiffusionUNetGlobal(compute_dtype=jnp.bfloat16, **kw)
    y16 = m16.apply({"params": params}, x, t, g)
    assert y16.dtype == jnp.float32
    assert float(jnp.abs(y16 - y32).max()) < 0.1
    corr = np.corrcoef(np.asarray(y32).ravel(), np.asarray(y16).ravel())[0, 1]
    assert corr > 0.999


def test_bf16_hfrm_close_to_f32():
    from wavedm_tpu.models.hfrm import HFRM

    kw = dict(dim=8, mid_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
    m32 = HFRM(**kw)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 48, 3))
    params = m32.init(jax.random.PRNGKey(1), x)["params"]
    y32 = m32.apply({"params": params}, x)
    m16 = HFRM(compute_dtype=jnp.bfloat16, **kw)
    y16 = m16.apply({"params": params}, x)
    assert y16.dtype == jnp.float32
    assert float(jnp.abs(y16 - y32).max()) < 0.05
    corr = np.corrcoef(np.asarray(y32).ravel(), np.asarray(y16).ravel())[0, 1]
    assert corr > 0.999
