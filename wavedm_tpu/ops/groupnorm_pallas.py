"""Fused GroupNorm(+swish) Pallas kernel.

XLA lowers GroupNorm to a stats reduce pass plus a normalize pass (2 HBM
reads + 1 write of the activation); profiling the flagship restoration shows
those ``convert_reduce`` stat reductions cost ~25% of the DDIM chain
(tools/trace_summary.py on the bf16 batch-4 trace).  This kernel computes
statistics and applies the affine (+ optional swish, which follows the norm
everywhere in the UNet except attention) in ONE read + ONE write per
activation: per grid step one sample's (H*W, C) block sits in VMEM -- at
most (4096, 128) bf16 = 1 MB at the UNet's widest spatial level.

Statistics accumulate in float32 (matching flax GroupNorm's fast-variance
formula E[x^2] - E[x]^2 with eps inside the rsqrt); the output returns in
the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, s_ref, b_ref, m_ref, mt_ref, o_ref, *,
            eps: float, swish: bool, n: float, rows: int):
    # Two in-VMEM phases over row chunks so f32 temporaries stay at
    # (rows, C) instead of the full (HW, C) block (the 384-channel
    # skip-concat blocks would otherwise blow the 16 MB VMEM budget).
    # Group combine/broadcast run as tiny matmuls with a (C, G) indicator
    # matrix -- Mosaic rejects lane-dim reshapes like (C,) -> (G, C/G).
    hw, c = x_ref.shape[1], x_ref.shape[2]
    nchunks = hw // rows

    def stats_body(i, acc):
        s1, s2 = acc
        ch = x_ref[0, pl.ds(i * rows, rows), :].astype(jnp.float32)
        return (s1 + jnp.sum(ch, axis=0, keepdims=True),
                s2 + jnp.sum(ch * ch, axis=0, keepdims=True))

    zero = jnp.zeros((1, c), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, nchunks, stats_body, (zero, zero))

    m = m_ref[...]                                  # (C, G) indicator
    mt = mt_ref[...]                                # (G, C)
    mean_g = jnp.dot(s1, m, preferred_element_type=jnp.float32) / n  # (1, G)
    msq_g = jnp.dot(s2, m, preferred_element_type=jnp.float32) / n
    var_g = msq_g - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, mt, preferred_element_type=jnp.float32)  # (1, C)
    inv_c = jnp.dot(inv_g, mt, preferred_element_type=jnp.float32)
    # fold the affine: y = x * a + b with a = inv*scale, b = bias - mean*a
    a = inv_c * s_ref[...][None, :].astype(jnp.float32)
    bb = b_ref[...][None, :].astype(jnp.float32) - mean_c * a

    def apply_body(i, _):
        ch = x_ref[0, pl.ds(i * rows, rows), :].astype(jnp.float32)
        y = ch * a + bb
        if swish:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * rows, rows), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, apply_body, 0)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "swish",
                                             "interpret"))
def fused_group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, *,
                     num_groups: int = 32, eps: float = 1e-6,
                     swish: bool = False,
                     interpret: bool | None = None) -> jax.Array:
    """GroupNorm(num_groups, eps) + affine (+ swish) over NHWC ``x``.

    scale/bias: (C,).  Returns x's dtype.  ``interpret=None`` auto-selects
    the Pallas interpreter off-TPU (tests on the virtual CPU mesh)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    assert c % num_groups == 0, (c, num_groups)
    cg = c // num_groups
    x2 = x.reshape(b, h * w, c)
    # (C, G) group-indicator and its transpose (see kernel comment)
    ind = jnp.asarray(
        (jnp.arange(c)[:, None] // cg) == jnp.arange(num_groups)[None, :],
        jnp.float32)
    hw = h * w
    rows = 256 if hw % 256 == 0 else (64 if hw % 64 == 0 else hw)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, swish=swish,
                          n=float(h * w * cg), rows=rows),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, scale, bias, ind, ind.T)
    return out.reshape(b, h, w, c)
