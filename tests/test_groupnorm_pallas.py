"""Fused Pallas GroupNorm(+swish) parity with flax GroupNorm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from wavedm_tpu.ops.groupnorm_pallas import fused_group_norm


@pytest.mark.parametrize("shape,groups", [
    ((3, 16, 16, 128), 32),
    ((2, 8, 8, 768), 32),
    ((1, 64, 64, 96), 32),
    ((2, 5, 7, 64), 16),
])
def test_fused_gn_matches_flax(shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 3 + 1)
    scale = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))

    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-6)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    out = fused_group_norm(x, scale, bias, num_groups=groups)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_gn_swish_and_bf16():
    rng = np.random.default_rng(1)
    x32 = rng.standard_normal((2, 16, 16, 128)).astype(np.float32)
    scale = jnp.ones(128)
    bias = jnp.zeros(128)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, jnp.asarray(x32))
    ref = ref * jax.nn.sigmoid(ref)
    out = fused_group_norm(jnp.asarray(x32), scale, bias, swish=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    out16 = fused_group_norm(jnp.asarray(x32, jnp.bfloat16), scale, bias,
                             swish=True)
    assert out16.dtype == jnp.bfloat16
    assert float(jnp.abs(out16.astype(jnp.float32) - ref).max()) < 0.05


def test_fused_unet_matches_plain():
    """fused_gn=True is a kernel swap, not a model change: same params,
    same outputs."""
    from wavedm_tpu.models.unet import DiffusionUNet

    kw = dict(in_channels=6, out_ch=3, ch=32, ch_mult=(1, 2),
              num_res_blocks=1, attn_resolutions=(8,), resolution=16)
    plain = DiffusionUNet(**kw)
    fused = DiffusionUNet(fused_gn=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 6))
    t = jnp.array([3.0, 7.0])
    params = plain.init(jax.random.PRNGKey(1), x, t)["params"]
    # identical param trees
    pf = fused.init(jax.random.PRNGKey(1), x, t)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(pf)
    y0 = plain.apply({"params": params}, x, t)
    y1 = fused.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=5e-5, rtol=1e-4)
