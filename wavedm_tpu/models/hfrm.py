"""HFRM: the stage-1 high-frequency restoration module (Flax, NHWC).

NAFNet-style encoder-decoder matching the reference ``HFRM``
(models/arch.py:158-253): conv_in -> per-level ResidualBlock stacks with 2x2
stride-2 down convs, a middle stack, then 1x1-conv + pixel-shuffle upsampling
with additive encoder skips, conv_out, and a global ``x + input`` residual.

Each ResidualBlock (models/arch.py:158-204) is
  LayerNorm2d -> 1x1 expand(2x) -> 3x3 depthwise -> SimpleGate(split-multiply)
  -> channel attention (global-mean + 1x1) -> 1x1 -> +beta*x
  followed by LayerNorm2d -> 1x1 expand -> SimpleGate -> 1x1 -> +gamma*y
with learnable per-channel beta/gamma residual scales initialised to zero.

TPU notes: channels-last keeps the 1x1 convs as MXU matmuls; the depthwise
3x3 and gates fuse into the surrounding elementwise graph under XLA.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wavedm_tpu.config import Config


class LayerNorm2d(nn.Module):
    """Per-pixel channel LayerNorm with *biased* variance and eps added to
    var before sqrt (reference: models/arch.py:7-42) -- note this differs
    from flax LayerNorm only in affine param shape bookkeeping.  Statistics
    always accumulate in float32; the output returns in the input dtype."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + self.eps)
        return (y * weight + bias).astype(x.dtype)


def simple_gate(x: jax.Array) -> jax.Array:
    """Split channels in half, multiply (reference SpatialAttn,
    models/arch.py:132-141)."""
    a, b = jnp.split(x, 2, axis=-1)
    return a * b


class ChannelAttn(nn.Module):
    """Global-average-pool -> 1x1 conv -> elementwise scale
    (reference: models/arch.py:143-155).  With ``local_kernel`` set, the
    global pool becomes a TLC windowed average (models/arch.py:46-130;
    see wavedm_tpu/ops/tlc.py)."""
    tlc: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        if self.tlc is not None:
            from wavedm_tpu.ops.tlc import local_avg_pool, tlc_kernel
            base_hw, train_hw = self.tlc
            k = tlc_kernel((x.shape[1], x.shape[2]), train_hw, base_hw)
            s = local_avg_pool(x, k)
        else:
            s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="chan_conv")(s)
        return x * s


class HFRMBlock(nn.Module):
    """One NAFNet-style residual block (reference ResidualBlock,
    models/arch.py:158-204)."""
    tlc: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        dt = self.dtype

        h = LayerNorm2d(name="norm1")(x)
        h = nn.Conv(dim * 2, (1, 1), dtype=dt, name="conv1")(h)
        h = nn.Conv(dim * 2, (3, 3), padding="SAME", dtype=dt,
                    feature_group_count=dim * 2, name="conv2")(h)
        h = simple_gate(h)
        h = ChannelAttn(self.tlc, dtype=dt, name="channel_attn")(h)
        h = nn.Conv(dim, (1, 1), dtype=dt, name="conv3")(h)
        beta = self.param("beta", nn.initializers.zeros, (dim,))
        y = x + (h * beta).astype(x.dtype)

        h = LayerNorm2d(name="norm2")(y)
        h = nn.Conv(dim * 2, (1, 1), dtype=dt, name="conv4")(h)
        h = simple_gate(h)
        h = nn.Conv(dim, (1, 1), dtype=dt, name="conv5")(h)
        gamma = self.param("gamma", nn.initializers.zeros, (dim,))
        return y + (h * gamma).astype(y.dtype)


def pixel_shuffle(x: jax.Array, p: int = 2) -> jax.Array:
    """torch.nn.PixelShuffle semantics in NHWC: channel index c*p*p + i*p + j
    scatters to spatial offset (i, j)."""
    b, h, w, cpp = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, h, w, c, p, p)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * p, w * p, c)


class HFRM(nn.Module):
    """High-frequency restoration module (reference: models/arch.py:206-253)."""

    in_channel: int = 3
    dim: int = 32
    mid_blk_num: int = 6
    enc_blk_nums: Tuple[int, ...] = (2, 2, 2, 4)
    dec_blk_nums: Tuple[int, ...] = (2, 2, 2, 2)
    # TLC (test-time local converter): (base_hw, train_hw); None = global pool
    tlc: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None
    compute_dtype: jnp.dtype = jnp.float32
    # Rematerialize each residual block under autodiff (jax.checkpoint):
    # full-image stage-1 training at dim 32 otherwise overflows a 16 GB chip
    # -- full-res block activations are ~0.5 GB each at batch 2.  Forward
    # cost is unchanged; backward recomputes the block interior.
    remat: bool = False

    @classmethod
    def from_config(cls, cfg: Config) -> "HFRM":
        return cls(dim=cfg.hfrm.dim, mid_blk_num=cfg.hfrm.middle_blk_num,
                   enc_blk_nums=cfg.hfrm.enc_blk_nums,
                   dec_blk_nums=cfg.hfrm.dec_blk_nums,
                   remat=cfg.hfrm.remat,
                   compute_dtype=jnp.bfloat16
                   if cfg.parallel.compute_dtype == "bfloat16"
                   else jnp.float32)

    @nn.compact
    def __call__(self, x):
        inp = x
        h_in, w_in = x.shape[1], x.shape[2]
        # Pad to a multiple of 2**num_levels so every stride-2 down has an
        # exactly-matching skip; output is cropped back below.  (The reference
        # crops its output to [:H, :W] (models/arch.py:253) but omits the
        # corresponding pad, so non-multiple sizes crash there.)
        mult = 2 ** len(self.enc_blk_nums)
        pad_h = (-h_in) % mult
        pad_w = (-w_in) % mult
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        dt = (None if self.compute_dtype == jnp.float32
              else self.compute_dtype)
        x = x.astype(self.compute_dtype)
        x = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=dt,
                    name="conv_in")(x)
        Block = nn.remat(HFRMBlock) if self.remat else HFRMBlock

        dim = self.dim
        skips = []
        for li, num in enumerate(self.enc_blk_nums):
            for bi in range(num):
                x = Block(self.tlc, dtype=dt, name=f"enc_{li}_{bi}")(x)
            skips.append(x)
            x = nn.Conv(dim * 2, (2, 2), strides=(2, 2), padding="VALID",
                        dtype=dt, name=f"down_{li}")(x)
            dim *= 2

        for bi in range(self.mid_blk_num):
            x = Block(self.tlc, dtype=dt, name=f"mid_{bi}")(x)

        for li, num in enumerate(self.dec_blk_nums):
            x = nn.Conv(dim * 2, (1, 1), use_bias=False, dtype=dt,
                        name=f"up_{li}")(x)
            x = pixel_shuffle(x, 2)
            dim //= 2
            x = x + skips[-(li + 1)]
            for bi in range(num):
                x = Block(self.tlc, dtype=dt, name=f"dec_{li}_{bi}")(x)

        x = nn.Conv(self.in_channel, (3, 3), padding="SAME", dtype=dt,
                    name="conv_out")(x)
        return x[:, :h_in, :w_in, :].astype(jnp.float32) + inp
