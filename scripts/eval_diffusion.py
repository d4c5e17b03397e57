#!/usr/bin/env python
"""Evaluate / restore: run the full-image diffusive restoration over a test
set and report PSNR (3 variants) + SSIM.

TPU-native replacement for the reference eval path
(test_weather_script.py -> eval_diffusion.py -> DiffusiveRestoration.restore).

Usage:
  python scripts/eval_diffusion.py --config wavedm_tpu/configs/raindrop_wavelet.yaml \
      --resume <ckpt> [--hfrm-ckpt <ckpt>] [--image-folder results/images]
  python scripts/eval_diffusion.py --config ... --smoke     # synthetic images
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE",
                   help="config override, repeatable (YAML-parsed value)")
    p.add_argument("--resume", default="", help="Diffusion checkpoint "
                   "(orbax dir, or reference .pth.tar via torch_compat)")
    p.add_argument("--hfrm-ckpt", default="")
    p.add_argument("--image-folder", default="",
                   help="Dump restored/cond/gt images here")
    p.add_argument("--grid-r", type=int, default=None)
    p.add_argument("--sampling-timesteps", type=int, default=None)
    p.add_argument("--x0-pred-index", type=int, default=None,
                   help="Which x0 estimate to output (reference: -5, "
                        "models/restoration.py:108)")
    p.add_argument("--whole-image", action="store_true",
                   help="Non-tiled generalized_steps eval "
                        "(sampling.whole_image)")
    p.add_argument("--t-start", type=int, default=None,
                   help="Truncated refinement: run the chain over "
                        "[0, t_start) from noised init_ll (sampling.t_start)")
    p.add_argument("--solver", default=None, choices=["ddim", "dpmpp2m"],
                   help="reverse-chain update rule (sampling.solver)")
    p.add_argument("--init-ll", default=None,
                   choices=["hfrm", "cond", "noise"],
                   help="LL source noised to t_start (sampling.init_ll)")
    p.add_argument("--test-set", default="raindrop")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--ema", action="store_true",
                   help="Evaluate EMA weights (the reference defines but "
                        "never enables this; models/restoration.py:24)")
    p.add_argument("--n-images", type=int, default=0, help="Cap image count")
    p.add_argument("--eval-batch", type=int, default=1,
                   help="Restore N same-geometry images per fused program "
                        "(batch 8 is the chip-saturation sweet spot)")
    return p.parse_args()


def main():
    args = parse_args()
    from wavedm_tpu.utils.tpu_lock import acquire_tpu_lock
    acquire_tpu_lock('eval_diffusion')
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavedm_tpu.config import load_config
    from wavedm_tpu.inference.restoration import DiffusiveRestoration
    from wavedm_tpu.models.hfrm import HFRM
    from wavedm_tpu.parallel.distributed import initialize_multihost

    initialize_multihost()  # reference eval also NCCL-inits
    # (eval_diffusion.py:83); no-op single-process
    cfg = load_config(args.config, args.overrides)
    if args.grid_r is not None:
        cfg.sampling.grid_r = args.grid_r
    if args.sampling_timesteps is not None:
        cfg.sampling.sampling_timesteps = args.sampling_timesteps
    if args.x0_pred_index is not None:
        cfg.sampling.x0_pred_index = args.x0_pred_index
    if args.whole_image:
        cfg.sampling.whole_image = True
    if args.t_start is not None:
        cfg.sampling.t_start = args.t_start
    if args.init_ll is not None:
        cfg.sampling.init_ll = args.init_ll
    if args.solver is not None:
        cfg.sampling.solver = args.solver
    cfg.validate()

    key = jax.random.PRNGKey(cfg.training.seed)
    from wavedm_tpu.inference.loader import build_unet
    unet, init_args = build_unet(cfg)
    uparams = jax.jit(unet.init)(key, *init_args)["params"]

    if args.resume:
        if args.resume.endswith((".pth", ".pth.tar", ".pt")):
            from wavedm_tpu.utils.torch_compat import (
                convert_unet_state_dict, load_torch_checkpoint)
            # --ema reads the reference's ema_helper shadow (same key
            # layout as state_dict; registered pre-DDP-wrap so unprefixed)
            sd = load_torch_checkpoint(args.resume, ema=args.ema)
            uparams = convert_unet_state_dict(
                sd, num_levels=len(cfg.model.ch_mult),
                num_res_blocks=cfg.model.num_res_blocks)
        else:
            from wavedm_tpu.utils.checkpoint import load_checkpoint
            state, _ = load_checkpoint(args.resume)
            uparams = state.ema if args.ema else state.params
        print(f"=> loaded checkpoint '{args.resume}'")
    else:
        print("Pre-trained diffusion model path is missing! (random weights)")

    hfrm_apply = hfrm_params = None
    if cfg.data.wavelet and not cfg.data.wavelet_in_unet:
        hfrm = HFRM.from_config(cfg)
        hfrm_params = hfrm.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
        path = args.hfrm_ckpt or cfg.hfrm.ckpt_path
        if path:
            sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
            from scripts.train_diffusion import load_hfrm_params
            hfrm_params = load_hfrm_params(path, cfg)
        hfrm_apply = hfrm.apply

    restorer = DiffusiveRestoration(cfg, unet.apply, uparams,
                                    hfrm_apply, hfrm_params)

    if args.smoke:
        from wavedm_tpu.data.synthetic import SyntheticPairs
        src = SyntheticPairs(n_images=args.n_images or 2)
        samples = ((np.concatenate([c, g], axis=-1), f"synthetic{i}")
                   for i, (c, g) in enumerate(
                       src[j] for j in range(len(src))))
    else:
        from wavedm_tpu.data.raindrop import RainDrop
        ds = RainDrop(cfg, jax.process_index(), jax.process_count())
        samples = ds.eval_samples()
        if args.n_images:
            import itertools
            samples = itertools.islice(samples, args.n_images)

    res = restorer.restore(samples, save_dir=args.image_folder or None,
                           eval_batch=args.eval_batch)
    print("psnr all torch", res["psnr_torch"])
    print("psnr all np", res["psnr_np_y"])
    print("psnr all GPU", res["psnr_y"])
    print("ssim all", res["ssim"])
    print(f"({res['n_images']} images)")


if __name__ == "__main__":
    main()
