"""TLC: Test-time Local Converter.

Re-implements the reference's TLC machinery (models/arch.py:46-130,
NAFNet-style): at inference on large images, global average pooling inside
channel attention is replaced by a LOCAL windowed average whose kernel scales
with train-vs-test resolution, removing the train/test statistics mismatch.
The reference computes it with a padded integral image
(models/arch.py:96-107); here the integral image is two cumsums + four
gathers, fused by XLA.

The reference defines but never calls this ("dead" inventory item); we expose
it as a working option: ``HFRM(..., tlc_train_size=(H, W))`` converts every
ChannelAttn to local pooling (see wavedm_tpu/models/hfrm.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def local_avg_pool(x: jax.Array, kernel: Tuple[int, int]) -> jax.Array:
    """Windowed average with replicate-padded centering, matching the
    reference AvgPool2d (models/arch.py:96-113): output spatial size equals a
    VALID window sweep, then replicate-pad back to the input size.

    x: (B, H, W, C); kernel: (kh, kw) clipped to the input size.
    """
    b, h, w, c = x.shape
    kh = min(h, kernel[0])
    kw = min(w, kernel[1])
    if kh >= h and kw >= w:
        return jnp.broadcast_to(jnp.mean(x, axis=(1, 2), keepdims=True), x.shape)
    # integral image with leading zero row/col
    s = jnp.cumsum(jnp.cumsum(x, axis=1), axis=2)
    s = jnp.pad(s, ((0, 0), (1, 0), (1, 0), (0, 0)))
    s1 = s[:, :-kh, :-kw]
    s2 = s[:, :-kh, kw:]
    s3 = s[:, kh:, :-kw]
    s4 = s[:, kh:, kw:]
    out = (s4 + s1 - s2 - s3) / (kh * kw)
    # replicate-pad to input size, centered (models/arch.py:109-113)
    ph, pw = h - out.shape[1], w - out.shape[2]
    return jnp.pad(out, ((0, 0), (ph // 2, ph - ph // 2),
                         (pw // 2, pw - pw // 2), (0, 0)), mode="edge")


def tlc_kernel(test_hw: Tuple[int, int], train_hw: Tuple[int, int],
               base_hw: Tuple[int, int]) -> Tuple[int, int]:
    """Kernel-size rule from the reference (models/arch.py:66-74):
    kernel = test_size * base_size // train_size per axis."""
    return (max(1, test_hw[0] * base_hw[0] // train_hw[0]),
            max(1, test_hw[1] * base_hw[1] // train_hw[1]))
