#!/usr/bin/env python
"""Quality-loop diagnostic: decompose full-pipeline PSNR into per-band causes.

For each image it reports PSNR-Y (vs GT) of:
  input               : degraded input unchanged
  hfrm                : stage-1 output alone
  [inLL |hfrmHF]      : input LL band + HFRM high bands
  [gtLL |hfrmHF]      : oracle LL (the machinery ceiling)
  [diffLL|hfrmHF]     : the real full pipeline
  [diffLL|gtHF]       : diffusion LL with perfect high bands (isolates LL)
plus the wavelet-domain LL MSE of input/hfrm/diffusion vs GT LL.

Run on train-split images vs held-out to separate under-fitting from
over-fitting.  (VERDICT r2 weak item 1: the 23.56 dB full-pipeline number
needed exactly this ablation.)

Usage:
  python tools/diag_quality.py --config wavedm_tpu/configs/rehearsal_wavelet.yaml \
      --resume saved_models/rehearsal_ddpm2/RainDrop_epoch1250_ddpm \
      --hfrm-ckpt saved_models/rehearsal/best --split both --n 4 [--ema]
      [--x0-pred-index -5] [--sampling-timesteps 25]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--resume", required=True)
    ap.add_argument("--hfrm-ckpt", required=True)
    ap.add_argument("--split", default="both",
                    choices=["train", "test", "both"])
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--x0-pred-index", type=int, default=None)
    ap.add_argument("--sampling-timesteps", type=int, default=None)
    ap.add_argument("--no-begin-from-noise", action="store_true")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    metavar="SECTION.KEY=VALUE")
    args = ap.parse_args()

    from wavedm_tpu.utils.tpu_lock import acquire_tpu_lock
    acquire_tpu_lock('diag_quality')
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavedm_tpu.config import load_config
    from wavedm_tpu.inference.restoration import DiffusiveRestoration
    from wavedm_tpu.models.hfrm import HFRM
    from wavedm_tpu.models.unet import DiffusionUNet
    from wavedm_tpu.ops.wavelet import wavelet_dec, wavelet_rec
    from wavedm_tpu.training.train_step import (data_transform,
                                                inverse_data_transform)
    from wavedm_tpu.utils import metrics as M
    from wavedm_tpu.utils.checkpoint import load_checkpoint
    from scripts.train_diffusion import load_hfrm_params

    cfg = load_config(args.config, getattr(args, 'overrides', []))
    if args.x0_pred_index is not None:
        cfg.sampling.x0_pred_index = args.x0_pred_index
    if args.sampling_timesteps is not None:
        cfg.sampling.sampling_timesteps = args.sampling_timesteps
    if args.no_begin_from_noise:
        cfg.data.begin_from_noise = False

    key = jax.random.PRNGKey(cfg.training.seed)
    unet = DiffusionUNet.from_config(cfg)
    sample = jnp.zeros((1, cfg.data.image_size, cfg.data.image_size,
                        cfg.model.unet_in_channels))
    uparams = jax.jit(unet.init)(key, sample, jnp.zeros((1,)))["params"]
    state, _ = load_checkpoint(args.resume)
    uparams = state.ema if args.ema else state.params

    hfrm = HFRM.from_config(cfg)
    hfrm_params = load_hfrm_params(args.hfrm_ckpt, cfg)
    restorer = DiffusiveRestoration(cfg, unet.apply, uparams,
                                    hfrm.apply, hfrm_params)

    m = cfg.model

    def run_image(pair, tag):
        cond, gt = pair[..., :3][None], pair[..., 3:][None]
        h, w = cond.shape[1:3]
        hw, ww = h // 4, w // 4
        sampler = restorer._make_sampler(hw, ww,
                                         use_other=m.use_other_channels)
        cond_w = wavelet_dec(data_transform(jnp.asarray(cond)))
        gt_w = wavelet_dec(data_transform(jnp.asarray(gt)))
        restored = hfrm.apply({"params": hfrm_params}, jnp.asarray(cond))
        hfrm_w = wavelet_dec(data_transform(restored))
        rng = jax.random.PRNGKey(cfg.training.seed)
        key_init, key_s = jax.random.split(rng)
        x_init = jax.random.normal(key_init, (1, hw, ww, m.pred_channels),
                                   jnp.float32)
        if not cfg.data.begin_from_noise:
            a_T = jnp.cumprod(1.0 - restorer.betas)[-1]
            x_init = (cond_w[..., :m.pred_channels] * jnp.sqrt(a_T)
                      + x_init * jnp.sqrt(1.0 - a_T))
        x_other = (hfrm_w[..., m.other_channels_begin:]
                   if m.use_other_channels else None)
        x_final, x0_preds = sampler(x_init, cond_w, x_other, key_s,
                                    params=uparams)
        # the tiled sampler trims the trajectory to the kept index
        sel = (0 if x0_preds.shape[0] == 1
               else cfg.sampling.x0_pred_index)
        diff_ll = np.asarray(x0_preds[sel])

        def rec(ll, hf):
            full = jnp.concatenate([ll[..., :3], hf[..., 3:]], axis=-1)
            return np.asarray(inverse_data_transform(wavelet_rec(full)))[0]

        gt0 = np.asarray(gt)[0]
        rows = {
            "input": np.asarray(cond)[0],
            "hfrm": np.asarray(restored)[0],
            "inLL|hfrmHF": rec(cond_w, hfrm_w),
            "gtLL|hfrmHF": rec(gt_w, hfrm_w),
            "diffLL|hfrmHF": rec(jnp.asarray(diff_ll), hfrm_w),
            "diffLL|gtHF": rec(jnp.asarray(diff_ll), gt_w),
        }
        ll_mse = {
            "inLL": float(jnp.mean((cond_w[..., :3] - gt_w[..., :3]) ** 2)),
            "hfrmLL": float(jnp.mean((hfrm_w[..., :3] - gt_w[..., :3]) ** 2)),
            "diffLL": float(np.mean((diff_ll[..., :3]
                                     - np.asarray(gt_w[..., :3])) ** 2)),
        }
        print(f"-- {tag}")
        for k, v in rows.items():
            print(f"   {k:>14}: {M.psnr_y(gt0, np.clip(v, 0, 1)):6.2f} dB")
        print("   LL MSE  " + "  ".join(f"{k}={v:.5f}"
                                        for k, v in ll_mse.items()))
        return rows, ll_mse

    from wavedm_tpu.data.raindrop import RainDropDataset
    splits = {"train": "train", "test": "raindrop_test"}
    wanted = ["train", "test"] if args.split == "both" else [args.split]
    for sp in wanted:
        root = os.path.join(cfg.data.data_dir, "raindrop", splits[sp])
        ds = RainDropDataset(root, cfg.data.patch_size, 1,
                             parse_patches=False)
        print(f"== split {sp} ({min(args.n, len(ds))} images) ==")
        for i in range(min(args.n, len(ds))):
            pair, img_id = ds._eval_sample(i)
            run_image(pair, f"{sp}/{img_id}")


if __name__ == "__main__":
    main()
