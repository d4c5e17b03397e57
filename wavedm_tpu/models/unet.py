"""Time-conditioned diffusion UNet (Flax, NHWC).

Architecture parity with the reference ``DiffusionUNet`` (models/unet.py:196-395,
itself the ddim-repo UNet): sinusoidal t-embedding -> 2-layer MLP, conv_in,
``len(ch_mult)`` resolution levels x ``num_res_blocks`` ResnetBlocks with
self-attention at ``attn_resolutions``, asymmetric-pad stride-2 downsampling,
mid block-attn-block, mirrored upsampling with skip-concat (num_res_blocks+1
blocks per level), GN -> swish -> conv_out.

Input channel arithmetic matches models/unet.py:212: with ``use_other_channels``
the input is [cond(in_channels) | x_t(pred_channels) | other HF channels
(in_channels - other_channels_begin)].

Optional hooks preserved from the reference: ``wavelet_in_unet`` (DWT on
entry / IWT on exit, models/unet.py:203-206,349,393-394) and ``use_window``
(space-to-depth reshuffle, models/unet.py:309-336).

TPU notes: NHWC layout, activations optionally bfloat16 with fp32 params;
per-level ResnetBlocks can be rematerialised (``remat=True``) to trade FLOPs
for HBM when training at large batch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wavedm_tpu.config import Config
from wavedm_tpu.models.layers import (
    AttnBlock,
    Downsample,
    Normalize,
    ResnetBlock,
    Upsample,
    get_timestep_embedding,
    swish,
)
from wavedm_tpu.ops.wavelet import wavelet_dec, wavelet_rec


def space_to_depth(x: jax.Array, p: int) -> jax.Array:
    """(B, H, W, C) -> (B, H/p, W/p, C*p*p), TILE decomposition: the image is
    cut into a p x p grid of contiguous (H/p, W/p) tiles, stacked as channels
    (reference ``to_win``, models/unet.py:309-315 -- note the reference splits
    H as (p, H/p), i.e. coarse bands, NOT interleaved pixel windows)."""
    b, h, w, c = x.shape
    x = x.reshape(b, p, h // p, p, w // p, c)
    # out channel = c*p*p + tile_row*p + tile_col
    x = x.transpose(0, 2, 4, 5, 1, 3)
    return x.reshape(b, h // p, w // p, c * p * p)


def depth_to_space(x: jax.Array, p: int) -> jax.Array:
    """Inverse of space_to_depth (reference ``win_back``, models/unet.py:316-321)."""
    b, h, w, cpp = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, h, w, c, p, p)
    x = x.transpose(0, 4, 1, 5, 2, 3)
    return x.reshape(b, h * p, w * p, c)


class TimestepMLP(nn.Module):
    ch: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, t):
        temb = get_timestep_embedding(t, self.ch)
        temb = nn.Dense(self.ch * 4, dtype=self.dtype, name="dense0")(temb)
        temb = swish(temb)
        temb = nn.Dense(self.ch * 4, dtype=self.dtype, name="dense1")(temb)
        return temb


class DiffusionUNet(nn.Module):
    """UNet epsilon-predictor.  Construct via ``DiffusionUNet.from_config``."""

    in_channels: int
    out_ch: int = 3
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 6)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 64
    wavelet_in_unet: bool = False
    use_window: bool = False
    window_size: int = 2
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    fused_gn: bool = False
    fused_block: bool = False

    @classmethod
    def from_config(cls, cfg: Config, **overrides) -> "DiffusionUNet":
        kw = dict(
            in_channels=cfg.model.unet_in_channels,
            out_ch=cfg.model.out_ch,
            ch=cfg.model.ch,
            ch_mult=tuple(cfg.model.ch_mult),
            num_res_blocks=cfg.model.num_res_blocks,
            attn_resolutions=tuple(cfg.model.attn_resolutions),
            dropout=cfg.model.dropout,
            resamp_with_conv=cfg.model.resamp_with_conv,
            resolution=cfg.data.image_size,
            wavelet_in_unet=cfg.data.wavelet_in_unet,
            use_window=cfg.data.use_window,
            window_size=cfg.data.window_size,
            compute_dtype=jnp.bfloat16
            if cfg.parallel.compute_dtype == "bfloat16" else jnp.float32,
            fused_gn=cfg.parallel.fused_groupnorm,
            fused_block=cfg.parallel.fused_resblock,
        )
        kw.update(overrides)
        return cls(**kw)

    @nn.compact
    def __call__(self, x, t, *, deterministic: bool = True):
        if self.use_window:
            p = self.window_size
            # split cond(3)/target, window each, re-concat (models/unet.py:317-325)
            x = jnp.concatenate(
                [space_to_depth(x[..., :3], p), space_to_depth(x[..., 3:], p)],
                axis=-1)
        if self.wavelet_in_unet:
            x = jnp.concatenate(
                [wavelet_dec(x[..., :3]), wavelet_dec(x[..., 3:])], axis=-1)

        # The reference asserts H == W == config.data.image_size
        # (models/unet.py:347), which CRASHES its own lap path (coarse
        # pyramid level at image_size/4, models/ddm.py:186-188, 230-232) and
        # its whole-image path on non-square images.  The REAL constraint is
        # the skip-concat divisibility of the down/up chain -- assert that
        # instead; attention placement stays keyed to the configured
        # resolution's halving chain (identical parameter structure).
        div = 2 ** (len(self.ch_mult) - 1)
        assert x.shape[1] % div == 0 and x.shape[2] % div == 0, (
            f"input dims {x.shape[1]}x{x.shape[2]} must be divisible by "
            f"{div} (2^(levels-1)) for the skip-concat chain")

        # compute dtype threads through EVERY layer (flax default dtype=None
        # would silently promote bf16 activations back to f32 against the
        # f32 params -- i.e. the bf16 flag would be a no-op)
        dt = None if self.compute_dtype == jnp.float32 else self.compute_dtype
        x = x.astype(self.compute_dtype)
        temb = TimestepMLP(self.ch, dtype=dt,
                           name="temb")(t).astype(self.compute_dtype)

        block_cls = nn.remat(ResnetBlock) if self.remat else ResnetBlock

        num_levels = len(self.ch_mult)
        curr_res = self.resolution

        # downsampling
        hs = [nn.Conv(self.ch, (3, 3), padding="SAME", dtype=dt,
                      name="conv_in")(x)]
        for i_level in range(num_levels):
            for i_block in range(self.num_res_blocks):
                h = block_cls(
                    out_channels=self.ch * self.ch_mult[i_level],
                    dropout=self.dropout, dtype=dt, fused_gn=self.fused_gn,
                    fused_block=self.fused_block,
                    name=f"down_{i_level}_block_{i_block}",
                )(hs[-1], temb, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=dt, fused_gn=self.fused_gn,
                                  name=f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != num_levels - 1:
                hs.append(Downsample(self.resamp_with_conv, dtype=dt,
                                     name=f"down_{i_level}_downsample")(hs[-1]))
                curr_res //= 2

        # middle
        h = hs[-1]
        h = block_cls(dropout=self.dropout, dtype=dt, fused_gn=self.fused_gn,
                      fused_block=self.fused_block, name="mid_block_1")(
            h, temb, deterministic=deterministic)
        h = AttnBlock(dtype=dt, fused_gn=self.fused_gn, name="mid_attn_1")(h)
        h = block_cls(dropout=self.dropout, dtype=dt, fused_gn=self.fused_gn,
                      fused_block=self.fused_block, name="mid_block_2")(
            h, temb, deterministic=deterministic)

        # upsampling (num_res_blocks + 1 blocks per level, skip-concat)
        for i_level in reversed(range(num_levels)):
            for i_block in range(self.num_res_blocks + 1):
                h = block_cls(
                    out_channels=self.ch * self.ch_mult[i_level],
                    dropout=self.dropout, dtype=dt, fused_gn=self.fused_gn,
                    fused_block=self.fused_block,
                    name=f"up_{i_level}_block_{i_block}",
                )(jnp.concatenate([h, hs.pop()], axis=-1), temb,
                  deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=dt, fused_gn=self.fused_gn,
                                  name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(self.resamp_with_conv, dtype=dt,
                             name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        assert not hs

        h = Normalize(dtype=dt, fused=self.fused_gn, fold_swish=True,
                      name="norm_out")(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=dt,
                    name="conv_out")(h)
        h = h.astype(jnp.float32)

        if self.use_window:
            h = depth_to_space(h, self.window_size)
        if self.wavelet_in_unet:
            h = wavelet_rec(h)
        return h
