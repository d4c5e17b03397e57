"""SAM: spatial attentive module with 8-direction IRNN sweeps (Flax, NHWC).

Re-implements the reference SAM stack (models/sam.py:6-210, SPANet-style),
which is dormant in the shipped config (only referenced from the inactive
WDNet RRDB chain, models/model_dense.py:405) but part of the component
inventory.  The reference's Python in-place row/column sweeps become
``lax.scan`` recurrences.

Reference quirks preserved faithfully (they define the trained function):
- All four DIAGONAL sweeps multiply by ``down_weight`` instead of their own
  dedicated weights (models/sam.py:97-119); the dedicated zuoshang/zuoxia/
  youshang/youxia weights exist but are unused -- we create them anyway.
- The "direction attention" in SAM calls ``Tensor.mul`` without assignment
  (models/sam.py:176-189), a no-op; we therefore apply no attention weighting
  there either (the attention head still runs, since its params are trained).
- Entries never touched by a sweep keep their ORIGINAL (un-ReLU'd) values
  (the reference updates slices of a clone of x).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _scan_axis(x, w, axis: int, reverse: bool, shift: int = 0):
    """Directional IRNN sweep: out[i] = relu(out[i-1] * w + x[i]) along
    ``axis`` (rows=1, cols=2 in NHWC), optionally reversed; ``shift`` moves
    the carry one pixel along the OTHER spatial axis per step (diagonals).
    Positions not reached by the recurrence keep x's value."""
    moved = jnp.moveaxis(x, axis, 0)  # (L, B, other, C)

    def step(carry, x_i):
        if shift:
            carry = jnp.roll(carry, shift, axis=1)
            if shift > 0:
                carry = carry.at[:, :shift].set(0.0)
            else:
                carry = carry.at[:, shift:].set(0.0)
        updated = jax.nn.relu(carry * w + x_i)
        if shift > 0:
            updated = updated.at[:, :shift].set(x_i[:, :shift])
        elif shift < 0:
            updated = updated.at[:, shift:].set(x_i[:, shift:])
        return updated, updated

    rest = moved[1:] if not reverse else moved[:-1][::-1]
    init = moved[0] if not reverse else moved[-1]
    _, ys = jax.lax.scan(step, init, rest)
    if reverse:
        out = jnp.concatenate([ys[::-1], init[None]], axis=0)
    else:
        out = jnp.concatenate([init[None], ys], axis=0)
    return jnp.moveaxis(out, 0, axis)


class IRNNLayer(nn.Module):
    """8-direction recurrent sweeps (reference irnn_layer,
    models/sam.py:73-120).  Returns (up, right, down, left, zuoxia, youxia,
    zuoshang, youshang)."""

    @nn.compact
    def __call__(self, x):
        ones = nn.initializers.ones
        w_left = self.param("left_weight", ones, ())
        w_right = self.param("right_weight", ones, ())
        w_up = self.param("up_weight", ones, ())
        w_down = self.param("down_weight", ones, ())
        # dedicated diagonal weights exist in the reference but are unused
        for name in ("zuoshang_weight", "zuoxia_weight",
                     "youshang_weight", "youxia_weight"):
            self.param(name, ones, ())

        down = _scan_axis(x, w_down, axis=1, reverse=False)
        up = _scan_axis(x, w_up, axis=1, reverse=True)
        right = _scan_axis(x, w_right, axis=2, reverse=False)
        left = _scan_axis(x, w_left, axis=2, reverse=True)
        # diagonals: reference uses down_weight for all four (see module doc)
        zuoxia = _scan_axis(x, w_down, axis=1, reverse=False, shift=1)
        youxia = _scan_axis(x, w_down, axis=1, reverse=False, shift=-1)
        zuoshang = _scan_axis(x, w_down, axis=2, reverse=False, shift=1)
        youshang = _scan_axis(x, w_down, axis=2, reverse=False, shift=-1)
        return up, right, down, left, zuoxia, youxia, zuoshang, youshang


class ChannelAttentionSAM(nn.Module):
    """avg+max pooled squeeze-excite (reference ChannelAttention,
    models/sam.py:6-24)."""
    ratio: int = 8

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        fc1 = nn.Conv(c // self.ratio, (1, 1), use_bias=False, name="fc1")
        fc2 = nn.Conv(c, (1, 1), use_bias=False, name="fc2")
        avg = fc2(nn.relu(fc1(jnp.mean(x, axis=(1, 2), keepdims=True))))
        mx = fc2(nn.relu(fc1(jnp.max(x, axis=(1, 2), keepdims=True))))
        return jax.nn.sigmoid(avg + mx)


class SpatialAttentionSAM(nn.Module):
    """mean/max channel stats -> 7x7 conv -> sigmoid (reference
    SpatialAttention, models/sam.py:26-44)."""
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        h = jnp.concatenate([avg, mx], axis=-1)
        h = nn.Conv(1, (self.kernel_size, self.kernel_size), padding="SAME",
                    use_bias=False, name="conv1")(h)
        return jax.nn.sigmoid(h)


class SAMAttention(nn.Module):
    """Direction-weight head (reference Attention, models/sam.py:123-147)."""

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(8, (1, 1), name="conv3")(x)
        h = nn.relu(h)
        h = ChannelAttentionSAM(name="ca")(h) * h
        h = SpatialAttentionSAM(name="sa")(h) * h
        return h


class SAM(nn.Module):
    """Spatial attentive module producing a 1-channel mask
    (reference SAM, models/sam.py:150-210)."""
    out_channels: int = 32
    attention: bool = True

    @nn.compact
    def __call__(self, x):
        if self.attention:
            _weight = SAMAttention(name="attention_layer")(x)
            # reference "direction attention" is a no-op (Tensor.mul without
            # assignment); _weight intentionally unused beyond this point.
            del _weight
        out = nn.Conv(self.out_channels, (1, 1), name="conv1")(x)
        dirs = IRNNLayer(name="irnn1")(out)
        out = jnp.concatenate(dirs, axis=-1)
        out = nn.Conv(self.out_channels, (1, 1), name="conv2")(out)
        dirs = IRNNLayer(name="irnn2")(out)
        out = jnp.concatenate(dirs, axis=-1)
        out = nn.Conv(self.out_channels, (1, 1), name="conv3")(out)
        out = nn.relu(out)
        return nn.Conv(1, (1, 1), use_bias=False, name="conv_out")(out)
