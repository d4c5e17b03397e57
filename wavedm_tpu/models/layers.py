"""Shared Flax building blocks for the WaveDM-TPU networks.

Numerics track the reference layers exactly (GroupNorm eps, asymmetric
downsample padding, nearest-neighbor upsampling, timestep embedding), but the
implementation is NHWC / channels-last and relies on XLA fusion rather than
hand-scheduled modules.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "get_timestep_embedding",
    "swish",
    "Normalize",
    "Upsample",
    "Downsample",
    "ResnetBlock",
    "AttnBlock",
]


def get_timestep_embedding(timesteps: jax.Array, embedding_dim: int) -> jax.Array:
    """Sinusoidal timestep embedding (tensor2tensor/fairseq convention;
    reference: models/unet.py:10-28).  timesteps: (B,) float/int."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    scale = math.log(10000.0) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -scale)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


class _FusedGN(nn.Module):
    """Pallas fused GroupNorm(+swish); same param tree ('scale'/'bias')
    as flax GroupNorm so checkpoints are layout-independent."""
    num_groups: int = 32
    eps: float = 1e-6
    swish: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        from wavedm_tpu.ops.groupnorm_pallas import fused_group_norm
        return fused_group_norm(x, scale, bias, num_groups=self.num_groups,
                                eps=self.eps, swish=self.swish)


class Normalize(nn.Module):
    """GroupNorm(32, eps=1e-6) with affine (reference: models/unet.py:36-37).

    ``dtype`` is the COMPUTE dtype (params stay float32; statistics always
    accumulate in >= float32 on both paths).  ``fused`` switches to the
    Pallas one-pass kernel (ops/groupnorm_pallas.py); ``fold_swish``
    applies the swish that follows the norm at every UNet site except
    attention -- folded into the kernel on the fused path."""
    dtype: Optional[jnp.dtype] = None
    fused: bool = False
    fold_swish: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fused:
            return _FusedGN(num_groups=32, eps=1e-6, swish=self.fold_swish,
                            name="norm")(x)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, use_bias=True,
                         use_scale=True, dtype=self.dtype, name="norm")(x)
        return swish(y) if self.fold_swish else y


class Upsample(nn.Module):
    """Nearest x2 upsample, optional 3x3 conv (reference: models/unet.py:40-56)."""
    with_conv: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.with_conv:
            x = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                        name="conv")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3x3 conv with the reference's asymmetric (0,1,0,1) pad
    (models/unet.py:59-78), or 2x2 average pool."""
    with_conv: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            c = x.shape[-1]
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = nn.Conv(c, (3, 3), strides=(2, 2), padding="VALID",
                        dtype=self.dtype, name="conv")(x)
        else:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class _GNParamLeaf(nn.Module):
    """Parameter-only stand-in for nn.GroupNorm (same 'scale'/'bias')."""
    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return s, b


class _GNParams(nn.Module):
    """Matches Normalize's tree: <name>/norm/{scale,bias}."""
    features: int

    @nn.compact
    def __call__(self):
        return _GNParamLeaf(self.features, name="norm")()


class _ConvParams(nn.Module):
    """Parameter-only stand-in for nn.Conv 3x3 (same 'kernel'/'bias',
    same lecun-normal default init)."""
    features: int

    @nn.compact
    def __call__(self, cin: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class ResnetBlock(nn.Module):
    """GN -> swish -> conv -> +temb-proj -> GN -> swish -> dropout -> conv,
    with 1x1 (or 3x3) shortcut when channels change
    (reference: models/unet.py:81-138).

    ``fused_block`` routes each GN->swish->conv3x3 pair through the Pallas
    kernel (ops/fused_resblock.py; one HBM pass per site instead of the
    standalone statistics read) with an IDENTICAL parameter tree, so
    checkpoints are interchangeable between paths.  Falls back per-pair to
    the XLA composition for shapes the kernel doesn't cover and when
    dropout is active (the kernel has no dropout point)."""
    out_channels: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    fused_gn: bool = False
    fused_block: bool = False

    @nn.compact
    def __call__(self, x, temb, *, deterministic: bool = True):
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        dt = self.dtype
        cdt = dt or jnp.float32

        if self.fused_block:
            from wavedm_tpu.ops.fused_resblock import fused_gn_swish_conv
            s1, b1 = _GNParams(in_ch, name="norm1")()
            k1, bb1 = _ConvParams(out_ch, name="conv1")(in_ch)
            h = fused_gn_swish_conv(x, s1, b1, k1, bb1, cdt)
        else:
            h = Normalize(dtype=dt, fused=self.fused_gn, fold_swish=True,
                          name="norm1")(x)
            h = nn.Conv(out_ch, (3, 3), padding="SAME", dtype=dt,
                        name="conv1")(h)

        h = h + nn.Dense(out_ch, dtype=dt,
                         name="temb_proj")(swish(temb))[:, None, None, :]

        use_fused2 = self.fused_block and (self.dropout == 0.0
                                           or deterministic)
        if use_fused2:
            from wavedm_tpu.ops.fused_resblock import fused_gn_swish_conv
            s2, b2 = _GNParams(out_ch, name="norm2")()
            k2, bb2 = _ConvParams(out_ch, name="conv2")(out_ch)
            h = fused_gn_swish_conv(h, s2, b2, k2, bb2, cdt)
        else:
            h = Normalize(dtype=dt, fused=self.fused_gn, fold_swish=True,
                          name="norm2")(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = nn.Conv(out_ch, (3, 3), padding="SAME", dtype=dt,
                        name="conv2")(h)

        if in_ch != out_ch:
            if self.conv_shortcut:
                x = nn.Conv(out_ch, (3, 3), padding="SAME", dtype=dt,
                            name="conv_shortcut")(x)
            else:
                x = nn.Conv(out_ch, (1, 1), dtype=dt, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Full spatial self-attention with 1x1-conv projections
    (reference: models/unet.py:141-193).  Runs as one batched einsum chain;
    only ever instantiated at small resolutions (attn_resolutions=[16]).
    Logits accumulate in float32 regardless of compute dtype."""
    dtype: Optional[jnp.dtype] = None
    fused_gn: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        dt = self.dtype
        hn = Normalize(dtype=dt, fused=self.fused_gn, name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=dt, name="q")(hn).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=dt, name="k")(hn).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=dt, name="v")(hn).reshape(b, h * w, c)

        attn = jnp.einsum("bqc,bkc->bqk", q, k,
                          preferred_element_type=jnp.float32) * (c ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=dt, name="proj_out")(out)
        return x + out
