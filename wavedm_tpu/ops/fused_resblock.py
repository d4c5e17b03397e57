"""Fused GroupNorm -> swish -> 3x3 conv Pallas kernel (the ResnetBlock prefix).

Second attack on the GroupNorm cost (VERDICT r2 item 3).  Trace analysis
shows ~25% of restoration device time in GroupNorm statistic reductions:
XLA's schedule per norm->conv site is

    producer writes x (1W) ; stats pass reads x (1R) ;
    conv reads x with the normalize fused into its input (1R)

The round-2 standalone Pallas GroupNorm moved the normalize INTO a custom
call and lost (0.74x): it added a full intermediate write and broke XLA's
producer fusion.  This kernel instead moves the FUSION BOUNDARY past the
conv: one grid step loads a sample's (H, W, Cin) activation into VMEM once,
computes the group statistics there, normalizes + swishes in registers, and
feeds the MXU directly (3x3 conv as 9 shifted (H*W, Cin) @ (Cin, Cout)
matmuls over a zero-padded VMEM scratch) -- HBM traffic per site drops to
1R + 1W, eliminating the standalone stats read entirely.

Shapes: every ResnetBlock conv site in the flagship UNet has Cin/Cout a
multiple of 128 (ch=128, ch_mult (1,2,4,6), skip-concat sums), H*W from
64^2 down to 8^2.  Weights are Cout-chunked when 9*Cin*Cout*2B would
overflow VMEM (the 1536->768 up-level sites).

Autodiff: custom_vjp recomputes through the reference composition, so the
kernel is usable under grad (training) too; the win is aimed at the
inference chain.  Reference semantics: models/unet.py:119-138
(GroupNorm(32, eps 1e-6) -> swish -> Conv2d 3x3 pad 1).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GROUPS = 32
_EPS = 1e-6
# VMEM budget for the weight block (out of ~16 MB/core; activations + pad
# scratch + accumulator take the rest at the 64x64 sites)
_W_BYTES_MAX = 6 * 1024 * 1024


def _reference_impl(x, scale, bias, w, b, *, compute_dtype):
    """The exact XLA composition the kernel replaces (for VJP + tests)."""
    x32 = x.astype(jnp.float32)
    n, h, ww, c = x.shape
    g = _GROUPS
    xg = x32.reshape(n, h, ww, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + _EPS)).reshape(x.shape)
    y = y * scale + bias
    y = y * jax.nn.sigmoid(y)
    y = y.astype(compute_dtype)
    out = jax.lax.conv_general_dilated(
        y, w.astype(compute_dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (out + b).astype(x.dtype)


def _kernel(x_ref, scale_ref, bias_ref, w_ref, b_ref, out_ref, pad_ref,
            *, h, w_dim, cin, co_chunk, compute_dtype, row_chunks):
    g = _GROUPS
    cg = cin // g
    rc = h // row_chunks                           # image rows per chunk
    # Two CHUNKED passes over the sample (stats, then normalize+swish into
    # the pad scratch): a whole-block float32 view of the activation is
    # 2 x h*w*cin*4 bytes of live VMEM -- at the 64x64x384 up-level site
    # that alone is 12.6 MB and the kernel blew the 16 MB scoped-vmem limit
    # (the round-3 bench failure).  Chunking keeps f32 temporaries at
    # ~h*w*cin*4/row_chunks while the statistics stay exact (f32 sums).
    s1 = jnp.zeros((1, cin), jnp.float32)
    s2 = jnp.zeros((1, cin), jnp.float32)
    for i in range(row_chunks):
        xc = x_ref[0, i * rc:(i + 1) * rc].reshape(rc * w_dim, cin)
        xc = xc.astype(jnp.float32)
        s1 = s1 + jnp.sum(xc, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(xc * xc, axis=0, keepdims=True)
    # Group reduction/broadcast ride tiny matmuls against a constant 0/1
    # membership matrix -- avoids lane-splitting (Cin,) -> (g, Cin/g)
    # reshapes that Mosaic cannot lay out.
    ch = jax.lax.broadcasted_iota(jnp.int32, (cin, g), 0) // cg
    gr = jax.lax.broadcasted_iota(jnp.int32, (cin, g), 1)
    memb = (ch == gr).astype(jnp.float32)          # (Cin, g)
    npix = float(h * w_dim * cg)
    gmean = jnp.dot(s1, memb, preferred_element_type=jnp.float32) / npix
    gm2 = jnp.dot(s2, memb, preferred_element_type=jnp.float32) / npix
    rstd = jax.lax.rsqrt(gm2 - gmean * gmean + _EPS)      # (1, g)
    mu_c = jnp.dot(gmean, memb.T, preferred_element_type=jnp.float32)
    rs_c = jnp.dot(rstd, memb.T, preferred_element_type=jnp.float32)
    a = rs_c * scale_ref[:]                        # (1, Cin) folded affine
    bb = bias_ref[:] - mu_c * a                    # y = x*a + bb

    # zero-padded copy for the 9 shifted windows
    pad_ref[:] = jnp.zeros_like(pad_ref)
    for i in range(row_chunks):
        xc = x_ref[0, i * rc:(i + 1) * rc].reshape(rc * w_dim, cin)
        y = xc.astype(jnp.float32) * a + bb
        y = y * jax.nn.sigmoid(y)
        pad_ref[1 + i * rc:1 + (i + 1) * rc, 1:w_dim + 1, :] = (
            y.astype(compute_dtype).reshape(rc, w_dim, cin))

    # Conv accumulation, also row-chunked: per chunk the live set is one
    # (rc*W, Cin) shifted-window copy + an (rc*W, co) f32 accumulator
    # instead of their full-block versions -- this is what lets the largest
    # 64x64x384 up-concat site fit VMEM at all.
    for i in range(row_chunks):
        acc = jnp.zeros((rc * w_dim, co_chunk), jnp.float32)
        k = 0
        for dy in range(3):
            for dx in range(3):
                win = pad_ref[dy + i * rc:dy + i * rc + rc,
                              dx:dx + w_dim, :]
                acc = acc + jnp.dot(win.reshape(rc * w_dim, cin), w_ref[k],
                                    preferred_element_type=jnp.float32)
                k += 1
        out = (acc + b_ref[:]).reshape(rc, w_dim, co_chunk)
        out_ref[0, i * rc:(i + 1) * rc] = out.astype(out_ref.dtype)


def _co_chunk(cin: int, cout: int, compute_dtype=jnp.bfloat16) -> int:
    """Largest Cout chunk (multiple of 128 when possible) whose weight block
    fits the VMEM budget."""
    # weight bytes per output channel at the ACTUAL compute dtype -- a
    # hardcoded 2 under-budgets by 2x when compute_dtype is float32
    per_co = 9 * cin * jnp.dtype(compute_dtype).itemsize
    chunk = max(1, _W_BYTES_MAX // per_co)
    if cout <= chunk:
        return cout
    chunk = (chunk // 128) * 128 or min(cout, 128)
    while cout % chunk:
        chunk -= 128
        if chunk <= 0:
            return cout  # fall back: no clean chunking
    return chunk


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_gn_swish_conv(x, scale, bias, w, b, compute_dtype=jnp.bfloat16):
    """GroupNorm(32, 1e-6) -> swish -> conv3x3(SAME) + bias, one HBM pass.

    x: (N, H, W, Cin); scale/bias: (Cin,) f32; w: (3, 3, Cin, Cout);
    b: (Cout,).  Returns (N, H, W, Cout) in x.dtype.
    """
    return _forward(x, scale, bias, w, b, compute_dtype)


def _row_chunks(h: int, w_dim: int, cin: int) -> int:
    """Row-chunk count keeping each f32 pass temporary under ~1.5 MB."""
    rc = 1
    while h % (rc * 2) == 0 and (h // rc) * w_dim * cin * 4 > 1_500_000:
        rc *= 2
    return rc


def _vmem_estimate(h, w_dim, cin, co, x_itemsize, cdt_size, rc) -> int:
    """Upper-bound VMEM bytes for one grid step (blocks + scratch + the
    dominant transients); used to fall back to XLA before Mosaic hits the
    16 MB scoped limit (measured failure: 64x64x384 site, 17.36 MB)."""
    return (h * w_dim * cin * x_itemsize            # x block
            + (h + 2) * (w_dim + 2) * cin * cdt_size  # pad scratch
            + 9 * cin * co * cdt_size               # weight block
            + h * w_dim * co * x_itemsize           # out block
            + (h // rc) * w_dim * co * 4            # chunked f32 acc
            + (h // rc) * w_dim * cin * cdt_size    # chunked window copy
            + 3 * (h // rc) * w_dim * cin * 4)      # chunked f32 pass temps


def _forward(x, scale, bias, w, b, compute_dtype):
    n, h, w_dim, cin = x.shape
    cout = w.shape[-1]
    if cin % _GROUPS or cin % 128 or (h * w_dim) % 8:
        # shapes the kernel's layout rules don't cover -> XLA composition
        return _reference_impl(x, scale, bias, w, b,
                               compute_dtype=compute_dtype)
    co = _co_chunk(cin, cout, compute_dtype)
    rc = _row_chunks(h, w_dim, cin)
    xsz = jnp.dtype(x.dtype).itemsize
    csz = jnp.dtype(compute_dtype).itemsize
    # escalate chunking until the estimate fits the ~16 MB/core VMEM
    while (_vmem_estimate(h, w_dim, cin, co, xsz, csz, rc) > 14_000_000
           and h % (rc * 2) == 0):
        rc *= 2
    if _vmem_estimate(h, w_dim, cin, co, xsz, csz, rc) > 14_000_000:
        # cannot fit even fully chunked -> XLA composition
        return _reference_impl(x, scale, bias, w, b,
                               compute_dtype=compute_dtype)
    wk = w.reshape(9, cin, cout).astype(compute_dtype)
    interpret = jax.default_backend() != "tpu"

    grid = (n, cout // co)
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w_dim=w_dim, cin=cin, co_chunk=co,
                          compute_dtype=compute_dtype, row_chunks=rc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w_dim, cin), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, co), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w_dim, co), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w_dim, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w_dim + 2, cin), compute_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * 9 * h * w_dim * cin * cout,
            bytes_accessed=(n * h * w_dim * (cin + cout) * 2
                            + 9 * cin * cout * 2),
            transcendentals=n * h * w_dim * cin,
        ),
        interpret=interpret,
    )(x, scale.astype(jnp.float32).reshape(1, cin),
      bias.astype(jnp.float32).reshape(1, cin), wk,
      b.astype(jnp.float32).reshape(1, cout))
    return out


def _fwd(x, scale, bias, w, b, compute_dtype):
    return _forward(x, scale, bias, w, b, compute_dtype), \
        (x, scale, bias, w, b)


def _bwd(compute_dtype, res, gout):
    x, scale, bias, w, b = res
    _, vjp = jax.vjp(
        lambda *a: _reference_impl(*a, compute_dtype=compute_dtype),
        x, scale, bias, w, b)
    return vjp(gout)


fused_gn_swish_conv.defvjp(_fwd, _bwd)
