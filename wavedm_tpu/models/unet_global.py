"""Global-attention diffusion UNet (Flax, NHWC).

Variant of the UNet with a parallel whole-image ("global") encoder whose
features are cross-attended into the per-patch decoder at every resolution
level (reference ``DiffusionUNet_Global`` + ``Attn_Global``,
models/unet.py:397-636; enabled by ``data.global_attn``).

Reference quirks preserved deliberately (they affect checkpoints/outputs):
- ``Attn_Global`` normalises BOTH inputs with ``norm_patch``; its
  ``norm_global`` parameters exist but are never applied
  (models/unet.py:432-433).  We create the unused params too so converted
  reference checkpoints load exactly.
- After the last down level the global-attended ``h`` is discarded --
  the mid block restarts from ``hs[-1]`` (models/unet.py:582-585).

Documented deviation: the reference implementation CRASHES whenever
consecutive ch_mult entries differ at the boundary levels -- the last down
level and the first up level attend with a global feature of the previous
level's width (verified by running models/unet.py:397-636 directly; it is
dead code behind ``global_attn: False``).  We add the two missing 1x1
channel projections (``down_global_<last>_proj`` / ``up_global_0_proj``) so
the model actually runs; all other levels match the reference layer-for-layer.
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
    swish,
)
from wavedm_tpu.models.unet import TimestepMLP


class AttnGlobal(nn.Module):
    """Cross-attention: local-patch queries (strided conv tokens) attend to
    whole-image keys/values (grouped strided conv tokens)
    (reference models/unet.py:397-460)."""
    local_patch_size: int = 2
    global_patch_size: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_patch, x_global):
        """x_patch: (B, h, w, c); x_global: (Bg, H, W, c) with B % Bg == 0.

        Bg < B is the TPU-first broadcast path: the whole-image k/v encode
        runs ONCE per image and its tokens are repeated across the patch
        batch -- numerically identical to the reference's
        ``total.repeat(B, 1, 1, 1)`` (utils/sampling.py:485) which re-runs
        the global convs per patch.
        """
        c = x_patch.shape[-1]
        lp, gp = self.local_patch_size, self.global_patch_size
        dt = self.dtype
        norm_patch = Normalize(dtype=dt, name="norm_patch")
        norm_global = Normalize(dtype=dt, name="norm_global")
        h_ = norm_patch(x_patch)
        # The reference normalises the global branch with norm_patch as well
        # (models/unet.py:432-433); norm_global's params exist but are never
        # applied.  Call it once so the params are created (for checkpoint
        # parity) and discard the result.
        _unused = norm_global(x_global)
        del _unused
        h_global = norm_patch(x_global)

        q = nn.Conv(c, (lp, lp), strides=(lp, lp), padding="VALID",
                    dtype=dt, name="q")(h_)
        k = nn.Conv(c, (gp, gp), strides=(gp, gp), padding="VALID",
                    feature_group_count=c, dtype=dt, name="k")(h_global)
        v = nn.Conv(c, (gp, gp), strides=(gp, gp), padding="VALID",
                    feature_group_count=c, dtype=dt, name="v")(h_global)

        b, hq, wq, _ = q.shape
        bg, hk, wk, _ = k.shape
        qf = q.reshape(b, hq * wq, c)
        kf = k.reshape(bg, hk * wk, c)
        vf = v.reshape(bg, hk * wk, c)
        if bg != b:
            assert b % bg == 0, (b, bg)
            kf = jnp.repeat(kf, b // bg, axis=0)
            vf = jnp.repeat(vf, b // bg, axis=0)
        attn = jnp.einsum("bqc,bkc->bqk", qf, kf,
                          preferred_element_type=jnp.float32) * (c ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(vf.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, vf).reshape(b, hq, wq, c)
        out = nn.Conv(c, (1, 1), dtype=dt, name="proj_out")(out)
        if lp > 1:
            out = jnp.repeat(jnp.repeat(out, lp, axis=1), lp, axis=2)
        return x_patch + out


class DiffusionUNetGlobal(nn.Module):
    """UNet with per-level global cross-attention."""

    in_channels: int
    out_ch: int = 3
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 6)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 64
    global_channels: int = 48
    compute_dtype: jnp.dtype = jnp.float32
    fused_block: bool = False

    @classmethod
    def from_config(cls, cfg: Config) -> "DiffusionUNetGlobal":
        return cls(
            in_channels=cfg.model.in_channels * 2 if cfg.data.conditional
            else cfg.model.in_channels,
            out_ch=cfg.model.out_ch,
            ch=cfg.model.ch,
            ch_mult=tuple(cfg.model.ch_mult),
            num_res_blocks=cfg.model.num_res_blocks,
            attn_resolutions=tuple(cfg.model.attn_resolutions),
            dropout=cfg.model.dropout,
            resamp_with_conv=cfg.model.resamp_with_conv,
            resolution=cfg.data.image_size,
            global_channels=cfg.model.in_channels,
            compute_dtype=jnp.bfloat16
            if cfg.parallel.compute_dtype == "bfloat16" else jnp.float32,
            fused_block=cfg.parallel.fused_resblock,
        )

    @nn.compact
    def __call__(self, x, t, x_global, *, deterministic: bool = True):
        assert x.shape[1] == x.shape[2] == self.resolution
        dt = None if self.compute_dtype == jnp.float32 else self.compute_dtype
        x = x.astype(self.compute_dtype)
        x_global = x_global.astype(self.compute_dtype)
        temb = TimestepMLP(self.ch, dtype=dt,
                           name="temb")(t).astype(self.compute_dtype)
        num_levels = len(self.ch_mult)
        curr_res = self.resolution

        h_global = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=dt,
                           name="global_conv_in")(x_global)
        hs = [nn.Conv(self.ch, (3, 3), padding="SAME", dtype=dt,
                      name="conv_in")(x)]
        h = hs[-1]
        for i_level in range(num_levels):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(out_channels=block_out, dropout=self.dropout,
                                fused_block=self.fused_block,
                                dtype=dt,
                                name=f"down_{i_level}_block_{i_block}")(
                    h, temb, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=dt,
                                  name=f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != num_levels - 1:
                h = Downsample(self.resamp_with_conv, dtype=dt,
                               name=f"down_{i_level}_downsample")(h)
                hs.append(h)
                curr_res //= 2
                # 4x4 stride-2 pad-1 conv on the global branch
                h_global = nn.Conv(block_out, (4, 4), strides=(2, 2),
                                   padding=((1, 1), (1, 1)), dtype=dt,
                                   name=f"down_global_{i_level}_conv")(h_global)
            elif h_global.shape[-1] != block_out:
                # missing in the reference (it crashes here); see module doc
                h_global = nn.Conv(block_out, (1, 1), dtype=dt,
                                   name=f"down_global_{i_level}_proj")(h_global)
            h = AttnGlobal(dtype=dt,
                           name=f"down_global_{i_level}_attn")(h, h_global)

        # middle -- restarts from hs[-1], discarding the last global attn
        # (reference models/unet.py:582-585)
        h = hs[-1]
        h = ResnetBlock(dropout=self.dropout, dtype=dt,
                        fused_block=self.fused_block, name="mid_block_1")(
            h, temb, deterministic=deterministic)
        h = AttnBlock(dtype=dt, name="mid_attn_1")(h)
        h = ResnetBlock(dropout=self.dropout, dtype=dt,
                        fused_block=self.fused_block, name="mid_block_2")(
            h, temb, deterministic=deterministic)

        for i_level in reversed(range(num_levels)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(out_channels=block_out, dropout=self.dropout,
                                fused_block=self.fused_block,
                                dtype=dt,
                                name=f"up_{i_level}_block_{i_block}")(
                    jnp.concatenate([h, hs.pop()], axis=-1), temb,
                    deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=dt,
                                  name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(self.resamp_with_conv, dtype=dt,
                             name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
                h_global = nn.ConvTranspose(
                    block_out, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)), dtype=dt,
                    name=f"up_global_{i_level}_conv")(h_global)
            elif h_global.shape[-1] != block_out:
                # missing in the reference (it crashes here); see module doc
                h_global = nn.Conv(block_out, (1, 1), dtype=dt,
                                   name="up_global_0_proj")(h_global)
            h = AttnGlobal(dtype=dt,
                           name=f"up_global_{i_level}_attn")(h, h_global)

        h = Normalize(dtype=dt, name="norm_out")(h)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=dt,
                    name="conv_out")(h)
        return h.astype(jnp.float32)
