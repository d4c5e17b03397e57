"""Pallas kernel for the Haar wavelet-packet transform (scale 2) --
RETIRED on TPU hardware; kept as the interpret-mode template.

The production DWT/IWT (ops/wavelet.py) lowers to reshape + MXU matmul and is
already HBM-bandwidth-bound under XLA; this Pallas variant fused the block
reshuffle and the 16x16 basis contraction into one VMEM-resident kernel as
the hand-written alternative.  **Measured negative result (round 4, real
v5e):** Mosaic rejects the kernel's pixel-block reshuffle --

    infer-vector-layout: unsupported shape cast
    %7 = "tpu.reshape"(%6) : (vector<32x2160xf32>)
                           -> vector<8x4x180x4x3xf32>

the rank-5 view with minor dims (4, C=3) has no legal (sublane, lane)
layout.  The shuffle could only be made Mosaic-legal by burning MXU FLOPs on
block-diagonal permutation matmuls, and the XLA path is already at the HBM
roofline for this op (~1 R + 1 W), so there is no headroom for a hand
kernel to win.  The functions below therefore raise on a real TPU backend
(tools/pallas_smoke.py records this as the expected outcome) and remain
available in interpret mode, where numerics are identical to ops/wavelet.py
(fp32, verified in tests/test_wavelet_pallas.py).  Same engineering verdict
as the round-2 standalone GroupNorm kernel (config.py fused_groupnorm note).

Kernel layout: the image is viewed as one 2D array of 4-row groups x
(W*C) lanes; each grid step processes ROWS_PER_STEP output rows, reshaping
its (4*ROWS, W*C) tile into (ROWS * W/4 * C, 16) pixel-blocks and hitting
the MXU with the (16, 16) orthonormal basis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavedm_tpu.ops.wavelet import haar_packet_basis

_ROWS_PER_STEP = 8  # output rows per grid step (32 input rows)


def _dec_kernel(x_ref, basis_ref, o_ref, *, w: int, c: int):
    """x_ref: (4*R, W*C) input rows; o_ref: (R, W/4 * 16*C) output rows."""
    r = o_ref.shape[0]
    x = x_ref[:]                                   # (4R, W*C)
    # (4R, W*C) -> (R, 4, W/4, 4, C): rows split into groups of 4; lanes into
    # (block col, intra col, channel)
    xb = x.reshape(r, 4, w // 4, 4, c)
    # -> (R, W/4, C, 4, 4) -> (R * W/4 * C, 16) pixel blocks
    xb = xb.transpose(0, 2, 4, 1, 3).reshape(r * (w // 4) * c, 16)
    coeffs = jnp.dot(xb, basis_ref[:],
                     preferred_element_type=jnp.float32)  # (N, 16)
    # -> (R, W/4, C, 16) -> channel interleave k = f*C + c -> (R, W/4*16C)
    out = coeffs.reshape(r, w // 4, c, 16).transpose(0, 1, 3, 2)
    o_ref[:] = out.reshape(r, (w // 4) * 16 * c)


def _rec_kernel(z_ref, basis_ref, o_ref, *, w: int, c: int):
    """Inverse: z_ref (R, W/4 * 16*C) -> o_ref (4R, W*C)."""
    r = z_ref.shape[0]
    z = z_ref[:].reshape(r, w // 4, 16, c).transpose(0, 1, 3, 2)
    z = z.reshape(r * (w // 4) * c, 16)
    xb = jnp.dot(z, basis_ref[:].T, preferred_element_type=jnp.float32)
    xb = xb.reshape(r, w // 4, c, 4, 4).transpose(0, 3, 1, 4, 2)
    o_ref[:] = xb.reshape(4 * r, w * c)


def _call(kernel, x2d, basis, out_rows, out_cols, in_rows_per_step,
          out_rows_per_step, w, c, interpret):
    n_steps = out_rows // out_rows_per_step if kernel is _dec_kernel else (
        x2d.shape[0] // in_rows_per_step)
    grid = (x2d.shape[0] // in_rows_per_step,)
    return pl.pallas_call(
        functools.partial(kernel, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((out_rows, out_cols), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((in_rows_per_step, x2d.shape[1]),
                         lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_rows_per_step, out_cols),
                               lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2d, basis)


def _reject_on_tpu(interpret: bool):
    if not interpret and jax.default_backend() == "tpu":
        raise NotImplementedError(
            "wavelet Pallas kernel is a documented negative result on TPU "
            "(Mosaic: unsupported shape cast on the pixel-block reshuffle); "
            "use ops.wavelet -- the XLA path is already HBM-roofline-bound")


def wavelet_dec_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Scale-2 Haar packet DWT, NHWC (B, H, W, C) -> (B, H/4, W/4, 16*C)."""
    _reject_on_tpu(interpret)
    b, h, w, c = x.shape
    assert h % 4 == 0 and w % 4 == 0
    rows = _ROWS_PER_STEP
    # pad H/4 to a multiple of the step
    pad_out = (-(h // 4)) % rows
    if pad_out:
        x = jnp.pad(x, ((0, 0), (0, 4 * pad_out), (0, 0), (0, 0)))
    hh = x.shape[1]
    basis = jnp.asarray(haar_packet_basis(2), jnp.float32)

    def one(img):
        x2d = img.reshape(hh, w * c)
        out = _call(_dec_kernel, x2d, basis, hh // 4, (w // 4) * 16 * c,
                    4 * rows, rows, w, c, interpret)
        return out.reshape(hh // 4, w // 4, 16 * c)

    out = jax.vmap(one)(x)
    return out[:, :h // 4] if pad_out else out


def wavelet_rec_pallas(z: jax.Array, interpret: bool = False) -> jax.Array:
    """Inverse of wavelet_dec_pallas: (B, H, W, 16*C) -> (B, 4H, 4W, C)."""
    _reject_on_tpu(interpret)
    b, h, w, fc = z.shape
    c = fc // 16
    rows = _ROWS_PER_STEP
    pad_out = (-h) % rows
    if pad_out:
        z = jnp.pad(z, ((0, 0), (0, pad_out), (0, 0), (0, 0)))
    hh = z.shape[1]
    basis = jnp.asarray(haar_packet_basis(2), jnp.float32)

    def one(img):
        z2d = img.reshape(hh, w * 16 * c)
        out = _call(_rec_kernel, z2d, basis, 4 * hh, 4 * w * c,
                    rows, 4 * rows, 4 * w, c, interpret)
        return out.reshape(4 * hh, 4 * w, c)

    out = jax.vmap(one)(z)
    return out[:, :4 * h] if pad_out else out
