"""Checkpoint -> restorer assembly for the inference entry points.

Shared by ``scripts/eval_diffusion.py`` / ``scripts/restore.py`` /
``scripts/serve.py``: load UNet weights (Orbax tree or reference
``.pth.tar`` via torch_compat), the frozen stage-1 HFRM when the wavelet
path needs one, and build a :class:`DiffusiveRestoration`.  The reference
scatters this across ``models/ddm_wavelet.py:load_ddm_ckpt`` and
``eval_diffusion.py:29-44``; here it is one function with explicit failure
modes.
"""

from __future__ import annotations

from typing import Optional

from wavedm_tpu.config import Config


def load_hfrm_params(path: str, cfg: Config):
    """Stage-1 restorer params from an Orbax dir or a torch checkpoint;
    None when ``path`` is empty (reference train_diffusion.py:69-74)."""
    if not path:
        return None
    if path.endswith((".pth", ".pth.tar", ".pt")):
        from wavedm_tpu.utils.torch_compat import (convert_hfrm_state_dict,
                                                   load_torch_checkpoint)
        sd = load_torch_checkpoint(path)
        return convert_hfrm_state_dict(
            sd, enc_blk_nums=cfg.hfrm.enc_blk_nums,
            mid_blk_num=cfg.hfrm.middle_blk_num,
            dec_blk_nums=cfg.hfrm.dec_blk_nums)
    from wavedm_tpu.utils.checkpoint import load_checkpoint
    state, _ = load_checkpoint(path)
    return state.params


def load_unet_params(path: str, cfg: Config, ema: bool = False):
    """Diffusion UNet params from an Orbax TrainState dir or a reference
    torch checkpoint (``ema`` selects the EMA shadow in either format)."""
    if path.endswith((".pth", ".pth.tar", ".pt")):
        from wavedm_tpu.utils.torch_compat import (convert_unet_state_dict,
                                                   load_torch_checkpoint)
        sd = load_torch_checkpoint(path, ema=ema)
        return convert_unet_state_dict(
            sd, num_levels=len(cfg.model.ch_mult),
            num_res_blocks=cfg.model.num_res_blocks)
    from wavedm_tpu.utils.checkpoint import load_checkpoint
    state, _ = load_checkpoint(path)
    return state.ema if ema else state.params


def build_unet(cfg: Config):
    """(unet module, init example args) for the config's UNet family --
    the single source of the global-attention selection and the global
    tensor's init geometry (shared by eval/restore/serve)."""
    import jax.numpy as jnp

    from wavedm_tpu.models.unet import DiffusionUNet

    init_args = [jnp.zeros((1, cfg.data.image_size, cfg.data.image_size,
                            cfg.model.unet_in_channels)),
                 jnp.zeros((1,))]
    if cfg.data.global_attn:
        from wavedm_tpu.models.unet_global import DiffusionUNetGlobal
        unet = DiffusionUNetGlobal.from_config(cfg)
        gs = 8 * 2 ** (len(cfg.model.ch_mult) - 1)
        gc = (cfg.model.in_channels
              if cfg.data.wavelet and not cfg.data.wavelet_in_unet
              else cfg.data.channels)
        init_args.append(jnp.zeros((1, gs, gs, gc)))
    else:
        unet = DiffusionUNet.from_config(cfg)
    return unet, init_args


def build_restorer(cfg: Config, resume: str, hfrm_ckpt: str = "",
                   ema: bool = False, mesh=None):
    """Assemble the full restoration runner for a validated config.

    ``resume`` empty -> random-init UNet (smoke/testing).  Raises with a
    named error when the wavelet path lacks a stage-1 checkpoint.
    ``mesh``: optional 1-D data mesh for patch-parallel tiled inference.
    """
    import jax

    from wavedm_tpu.inference.restoration import DiffusiveRestoration

    unet, init_args = build_unet(cfg)
    if resume:
        uparams = load_unet_params(resume, cfg, ema=ema)
    else:
        uparams = jax.jit(unet.init)(
            jax.random.PRNGKey(cfg.training.seed), *init_args)["params"]

    hfrm_apply = hfrm_params = None
    if cfg.data.wavelet and not cfg.data.wavelet_in_unet:
        from wavedm_tpu.models.hfrm import HFRM
        hfrm_params = load_hfrm_params(hfrm_ckpt or cfg.hfrm.ckpt_path, cfg)
        if hfrm_params is None:
            raise ValueError(
                "the wavelet path needs a frozen stage-1 HFRM checkpoint "
                "(--hfrm-ckpt or hfrm.ckpt_path)")
        hfrm_apply = HFRM.from_config(cfg).apply

    return DiffusiveRestoration(cfg, unet.apply, uparams,
                                hfrm_apply, hfrm_params, mesh=mesh)
