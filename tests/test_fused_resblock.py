"""Fused GroupNorm->swish->conv3x3 kernel vs the XLA composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import wavedm_tpu.ops.fused_resblock as fr

pytestmark = pytest.mark.slow  # fast tier: -m 'not slow'


def _mk(n=2, h=8, w=16, cin=128, cout=128, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, h, w, cin)).astype(np.float32),
                    dtype)
    scale = jnp.asarray(rng.standard_normal(cin).astype(np.float32) * 0.1 + 1)
    bias = jnp.asarray(rng.standard_normal(cin).astype(np.float32) * 0.1)
    wk = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
                     * 0.05)
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32) * 0.1)
    return x, scale, bias, wk, b


@pytest.mark.parametrize("cout", [128, 256])
def test_matches_reference_composition(cout):
    x, scale, bias, w, b = _mk(cout=cout)
    got = fr.fused_gn_swish_conv(x, scale, bias, w, b, jnp.float32)
    want = fr._reference_impl(x, scale, bias, w, b,
                              compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_cout_chunking(monkeypatch):
    # shrink the VMEM weight budget so Cout gets chunked
    monkeypatch.setattr(fr, "_W_BYTES_MAX", 9 * 128 * 128 * 2)
    x, scale, bias, w, b = _mk(cout=256)
    assert fr._co_chunk(128, 256) == 128
    got = fr.fused_gn_swish_conv(x, scale, bias, w, b, jnp.float32)
    want = fr._reference_impl(x, scale, bias, w, b,
                              compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_fallback_on_uncovered_shapes():
    # cin=96 (not a multiple of 128) takes the XLA path, still correct
    x, scale, bias, w, b = _mk(cin=96, cout=128)
    got = fr.fused_gn_swish_conv(x, scale, bias, w, b, jnp.float32)
    want = fr._reference_impl(x, scale, bias, w, b,
                              compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_custom_vjp_matches_reference_grads():
    x, scale, bias, w, b = _mk(n=1, h=8, w=8)

    def loss_fused(*args):
        return jnp.sum(fr.fused_gn_swish_conv(*args, jnp.float32) ** 2)

    def loss_ref(*args):
        return jnp.sum(fr._reference_impl(
            *args, compute_dtype=jnp.float32) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, scale, bias, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, scale, bias, w, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=3e-3, rtol=3e-3)


def test_bf16_compute_close():
    x, scale, bias, w, b = _mk()
    got = fr.fused_gn_swish_conv(x, scale, bias, w, b, jnp.bfloat16)
    want = fr._reference_impl(x, scale, bias, w, b,
                              compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.05, rtol=0.05)


def test_unet_param_tree_identical_and_forward_close():
    """fused_resblock must produce the SAME param tree as the XLA path (so
    checkpoints interchange) and a numerically close forward."""
    from wavedm_tpu.config import config_from_dict
    from wavedm_tpu.models.unet import DiffusionUNet

    raw = {
        "data": {"image_size": 16, "patch_size": 64, "wavelet": True},
        "model": {"ch": 128, "ch_mult": [1, 2], "num_res_blocks": 1,
                  "attn_resolutions": [8]},
        "hfrm": {"dim": 4, "enc_blk_nums": [1, 1], "middle_blk_num": 1,
                 "dec_blk_nums": [1, 1]},
    }
    cfg = config_from_dict(raw)
    m_ref = DiffusionUNet.from_config(cfg)
    cfg2 = config_from_dict(raw)
    cfg2.parallel.fused_resblock = True
    m_fused = DiffusionUNet.from_config(cfg2)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 16, 16, 99)).astype(np.float32))
    t = jnp.zeros((1,))
    p_ref = m_ref.init(jax.random.PRNGKey(0), x, t)["params"]
    p_fused = m_fused.init(jax.random.PRNGKey(0), x, t)["params"]
    assert (jax.tree_util.tree_structure(p_ref)
            == jax.tree_util.tree_structure(p_fused))
    for a, c in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fused)):
        assert a.shape == c.shape

    # same params through both paths -> near-identical forward
    o_ref = m_ref.apply({"params": p_ref}, x, t)
    o_fused = m_fused.apply({"params": p_ref}, x, t)
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_ref),
                               atol=5e-4, rtol=5e-4)
