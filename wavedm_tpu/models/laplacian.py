"""Laplacian-pyramid domain transform (Flax/JAX, NHWC).

Re-implements the reference's optional Laplacian path (models/Lap.py:6-137,
enabled by ``data.lap``): a fixed 5x5 Gauss-kernel pyramid
decomposition/reconstruction plus the learned high-frequency translator
(``Trans_high`` / ``Lap_high_trans``) that predicts per-level masks.

The decom/recons identities (``x_check*`` in the reference,
models/ddm.py:337-353) are covered by tests/test_laplacian.py.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_GAUSS = np.array(
    [[1., 4., 6., 4., 1.],
     [4., 16., 24., 16., 4.],
     [6., 24., 36., 24., 6.],
     [4., 16., 24., 16., 4.],
     [1., 4., 6., 4., 1.]], dtype=np.float32) / 256.0


def _conv_gauss(img: jax.Array, scale: float = 1.0) -> jax.Array:
    """Depthwise 5x5 Gaussian with reflect padding
    (reference conv_gauss, models/Lap.py:38-41)."""
    c = img.shape[-1]
    k = jnp.asarray(_GAUSS * scale)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))  # HWIO with I=1, feature groups = c
    img = jnp.pad(img, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        img, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def _downsample(x: jax.Array) -> jax.Array:
    return x[:, ::2, ::2, :]


def _upsample(x: jax.Array) -> jax.Array:
    """Zero-stuff 2x then smooth with 4*kernel (models/Lap.py:28-36)."""
    b, h, w, c = x.shape
    up = jnp.zeros((b, h * 2, w * 2, c), x.dtype)
    up = up.at[:, ::2, ::2, :].set(x)
    return _conv_gauss(up, scale=4.0)


def _resize_to(x: jax.Array, h: int, w: int) -> jax.Array:
    if x.shape[1] == h and x.shape[2] == w:
        return x
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "nearest")


class LaplacianPyramid:
    """Fixed (parameter-free) pyramid decom/recons
    (reference Lap_Pyramid_Conv, models/Lap.py:6-64)."""

    def __init__(self, num_high: int = 3):
        self.num_high = num_high

    def decompose(self, img: jax.Array) -> List[jax.Array]:
        current = img
        pyr = []
        for _ in range(self.num_high):
            filtered = _conv_gauss(current)
            down = _downsample(filtered)
            up = _upsample(down)
            up = _resize_to(up, current.shape[1], current.shape[2])
            pyr.append(current - up)
            current = down
        pyr.append(current)
        return pyr

    def reconstruct(self, pyr: Sequence[jax.Array]) -> jax.Array:
        image = pyr[-1]
        for level in reversed(pyr[:-1]):
            up = _upsample(image)
            up = _resize_to(up, level.shape[1], level.shape[2])
            image = up + level
        return image


class _ResBlock(nn.Module):
    features: int
    res_dim: int = 64

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.res_dim, (3, 3), padding="SAME", name="conv1")(x)
        h = nn.leaky_relu(h, 0.01)
        h = nn.Conv(self.features, (3, 3), padding="SAME", name="conv2")(h)
        return x + h


class TransHigh(nn.Module):
    """Learned per-level masks for translating high-frequency bands
    (reference Trans_high, models/Lap.py:80-124)."""
    num_residual_blocks: int = 3
    res_dim: int = 64
    num_high: int = 3

    @nn.compact
    def __call__(self, x, pyr_original: Sequence[jax.Array]):
        h = nn.Conv(64, (3, 3), padding="SAME", name="conv_in")(x)
        h = nn.leaky_relu(h, 0.01)
        for i in range(self.num_residual_blocks):
            h = _ResBlock(64, self.res_dim, name=f"res_{i}")(h)
        mask = nn.Conv(3, (3, 3), padding="SAME", name="conv_mask")(h)

        results = []
        for i in range(self.num_high):
            lvl = pyr_original[-2 - i]
            m = _resize_to(mask, lvl.shape[1], lvl.shape[2])
            hf = lvl * m + lvl
            t = nn.Conv(16, (1, 1), name=f"trans_{i}_in")(hf)
            t = nn.leaky_relu(t, 0.01)
            for j in range(self.num_residual_blocks):
                t = _ResBlock(16, self.res_dim, name=f"trans_{i}_res_{j}")(t)
            t = nn.Conv(3, (1, 1), name=f"trans_{i}_out")(t)
            results.append(t)
            mask = m

        pyr_result = list(reversed(results))
        pyr_result.append(pyr_original[-1])
        return pyr_result


class LapHighTrans(nn.Module):
    """Wrapper feeding [second-coarsest high band | upsampled low band]
    into TransHigh (reference Lap_high_trans, models/Lap.py:127-137)."""
    res_num: int = 3
    res_dim: int = 64
    num_high: int = 3

    @nn.compact
    def __call__(self, pyr: Sequence[jax.Array]):
        low_up = _resize_to(pyr[-1], pyr[-2].shape[1], pyr[-2].shape[2])
        high_with_low = jnp.concatenate([pyr[-2], low_up], axis=-1)
        return TransHigh(self.res_num, self.res_dim, self.num_high,
                         name="trans_high")(high_with_low, pyr)
