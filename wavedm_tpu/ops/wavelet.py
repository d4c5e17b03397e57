"""Fixed Haar wavelet-packet transforms (DWT/IWT), TPU-native.

Re-designs the reference's ``WaveletTransform`` (reference: models/wavelet.py:6-50,
weights models/wavelet_weights_c2.pkl) as a reshape + small-matmul: a
``scale``-level Haar packet transform over a ``ks = 2**scale`` block is an
orthonormal linear map from the ks*ks pixels of each block to ks*ks subband
coefficients.  Instead of a grouped strided convolution (the reference's
``Conv2d(3, 3*ks*ks, ks, stride=ks, groups=3)``), we reshape the image into
(block, intra-block) axes and contract the (ks*ks)-sized intra-block axis with
the (ks*ks, ks*ks) basis matrix on the MXU.  XLA fuses the surrounding
reshapes/transposes, so the op is one HBM-bandwidth-bound pass.

Filter generation replaces the reference's pickled weights: the pickle's
``rec{2,4,8,16}`` banks are exactly the kron recursion

    B_1[f]  = G[f]                      (f in 0..3, 2x2 Haar quad, entries +-1/2)
    B_s[f]  = kron(G[f mod 4], B_{s-1}[f // 4])

which we generate in code and verify against the pickle bit-for-bit in tests
(filters are +-2**-s: exact in float32).

Channel layout matches the reference's post-conv interleave
(models/wavelet.py:40-43): output channel k = f * C + c for filter f and image
channel c, so for scale=2 / RGB the first 3 channels are the LL band of R,G,B.

Layout convention: NHWC (TPU-native). ``layout='NCHW'`` is accepted for
parity testing against the PyTorch reference.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "haar_packet_basis",
    "wavelet_dec",
    "wavelet_rec",
    "WaveletTransform",
]

# 2x2 Haar quad in the reference's filter order (verified vs. the pickle's
# ``rec2``): [LL, row-avg/col-diff, row-diff/col-avg, diag].
_G = np.array(
    [
        [[1.0, 1.0], [1.0, 1.0]],
        [[1.0, -1.0], [1.0, -1.0]],
        [[1.0, 1.0], [-1.0, -1.0]],
        [[1.0, -1.0], [-1.0, 1.0]],
    ],
    dtype=np.float64,
) / 2.0


@functools.lru_cache(maxsize=8)
def haar_packet_filters(scale: int) -> np.ndarray:
    """(4**scale, ks, ks) filter bank, reference pickle order, entries +-2**-scale."""
    if scale < 1:
        raise ValueError("scale must be >= 1")
    bank = _G
    for _ in range(scale - 1):
        prev = bank
        nf_prev = prev.shape[0]
        nf = 4 * nf_prev
        out = np.empty((nf, prev.shape[1] * 2, prev.shape[2] * 2), dtype=np.float64)
        for f in range(nf):
            out[f] = np.kron(_G[f % 4], prev[f // 4])
        bank = out
    return bank.astype(np.float64)


@functools.lru_cache(maxsize=8)
def haar_packet_basis(scale: int) -> np.ndarray:
    """(ks*ks, ks*ks) orthonormal basis matrix M with M[p*ks+q, f] = filter_f[p, q].

    Flattened so that ``coeffs = pixels_flat @ M`` performs the DWT of one
    block and ``pixels_flat = coeffs @ M.T`` inverts it exactly.
    """
    filters = haar_packet_filters(scale)  # (nf, ks, ks)
    nf, ks, _ = filters.shape
    return np.ascontiguousarray(filters.reshape(nf, ks * ks).T)  # (ks*ks, nf)


def _dec_nhwc(x: jax.Array, scale: int) -> jax.Array:
    ks = 2 ** scale
    nf = ks * ks
    b, h, w, c = x.shape
    if h % ks or w % ks:
        raise ValueError(f"spatial dims {(h, w)} not divisible by block {ks}")
    basis = jnp.asarray(haar_packet_basis(scale), dtype=x.dtype)
    # (b, h/ks, ks, w/ks, ks, c) -> blocks on last axis -> matmul on MXU
    xb = x.reshape(b, h // ks, ks, w // ks, ks, c)
    xb = xb.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // ks, w // ks, c, nf)
    # HIGHEST precision: on TPU the MXU would otherwise round inputs to
    # bfloat16, breaking the exact-roundtrip guarantee (filters are +-2**-s).
    coeffs = jnp.einsum("...cp,pf->...fc", xb, basis,
                        preferred_element_type=x.dtype,
                        precision=jax.lax.Precision.HIGHEST)
    # channel k = f * c_dim + c (reference interleave, models/wavelet.py:40-43)
    return coeffs.reshape(b, h // ks, w // ks, nf * c)


def _rec_nhwc(z: jax.Array, scale: int) -> jax.Array:
    ks = 2 ** scale
    nf = ks * ks
    b, h, w, fc = z.shape
    if fc % nf:
        raise ValueError(f"channel dim {fc} not divisible by {nf} subbands")
    c = fc // nf
    basis = jnp.asarray(haar_packet_basis(scale), dtype=z.dtype)
    zb = z.reshape(b, h, w, nf, c)
    xb = jnp.einsum("...fc,pf->...cp", zb, basis,
                    preferred_element_type=z.dtype,
                    precision=jax.lax.Precision.HIGHEST)
    xb = xb.reshape(b, h, w, c, ks, ks).transpose(0, 1, 4, 2, 5, 3)
    return xb.reshape(b, h * ks, w * ks, c)


def wavelet_dec(x: jax.Array, scale: int = 2, layout: str = "NHWC") -> jax.Array:
    """Haar wavelet-packet decomposition.

    NHWC: (B, H, W, C) -> (B, H/ks, W/ks, C * ks**2), channel k = f*C + c.
    Equivalent to the reference's dec-mode ``WaveletTransform`` with its
    channel interleave (models/wavelet.py:36-43).
    """
    if layout == "NHWC":
        return _dec_nhwc(x, scale)
    if layout == "NCHW":
        return _dec_nhwc(x.transpose(0, 2, 3, 1), scale).transpose(0, 3, 1, 2)
    raise ValueError(f"unknown layout {layout!r}")


def wavelet_rec(z: jax.Array, scale: int = 2, layout: str = "NHWC") -> jax.Array:
    """Inverse Haar wavelet-packet transform (exact inverse of wavelet_dec).

    Equivalent to the reference's rec-mode ``WaveletTransform``
    (models/wavelet.py:44-49): de-interleave then grouped transpose-conv.
    """
    if layout == "NHWC":
        return _rec_nhwc(z, scale)
    if layout == "NCHW":
        return _rec_nhwc(z.transpose(0, 2, 3, 1), scale).transpose(0, 3, 1, 2)
    raise ValueError(f"unknown layout {layout!r}")


class WaveletTransform:
    """Callable wrapper mirroring the reference module interface
    (models/wavelet.py:6: ``WaveletTransform(scale=2, dec=True)``)."""

    def __init__(self, scale: int = 2, dec: bool = True, layout: str = "NHWC"):
        self.scale = scale
        self.dec = dec
        self.layout = layout

    def __call__(self, x: jax.Array) -> jax.Array:
        fn = wavelet_dec if self.dec else wavelet_rec
        return fn(x, scale=self.scale, layout=self.layout)


def conv_weights(scale: int, channels: int = 3) -> np.ndarray:
    """Grouped-conv weight bank identical to the reference pickle's
    ``rec{2**scale}`` entry: shape (channels * 4**scale, 1, ks, ks).

    Used only for parity testing against ``lax.conv_general_dilated`` /
    the reference's torch conv path.
    """
    filters = haar_packet_filters(scale)  # (nf, ks, ks)
    nf, ks, _ = filters.shape
    w = np.tile(filters[None], (channels, 1, 1, 1)).reshape(channels * nf, 1, ks, ks)
    return w.astype(np.float32)
