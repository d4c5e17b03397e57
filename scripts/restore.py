#!/usr/bin/env python
"""Restore arbitrary degraded images (no ground truth needed).

The serving-style entry point: eval_diffusion.py mirrors the reference's
paired-eval protocol (input+gt, PSNR bookkeeping); this CLI restores a
directory or glob of plain images -- decode, canonical eval resize,
geometry-bucketed batching (batch 8 saturates the chip), full on-device
tiled-DDIM restoration, PNG outputs.  The reference has no equivalent
(its only inference path requires a ground-truth folder,
models/restoration.py:63-168).

Usage:
  python scripts/restore.py --config wavedm_tpu/configs/raindrop_wavelet.yaml \
      --resume <ckpt> --hfrm-ckpt <ckpt> --input 'photos/*.png' --out restored/
      [--batch 8] [--t-start 300 --sampling-timesteps 10]  # production sampling
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE",
                   help="config override, repeatable (YAML-parsed value)")
    p.add_argument("--resume", required=True)
    p.add_argument("--hfrm-ckpt", default="")
    p.add_argument("--input", required=True,
                   help="Image file, directory, or glob")
    p.add_argument("--out", required=True, help="Output directory")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--t-start", type=int, default=None)
    p.add_argument("--sampling-timesteps", type=int, default=None)
    p.add_argument("--init-ll", default=None,
                   choices=["hfrm", "cond", "noise"])
    p.add_argument("--solver", default=None, choices=["ddim", "dpmpp2m"],
                   help="reverse-chain update rule (sampling.solver)")
    p.add_argument("--x0-pred-index", type=int, default=None)
    p.add_argument("--grid-r", type=int, default=None)
    p.add_argument("--no-resize", action="store_true",
                   help="Keep native geometry (rounded to /16) instead of "
                        "the 720x480 eval canonicalization")
    return p.parse_args()


def list_inputs(spec):
    if os.path.isdir(spec):
        return sorted(
            os.path.join(spec, f) for f in os.listdir(spec)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".webp")))
    if any(ch in spec for ch in "*?["):
        return sorted(glob.glob(spec))
    return [spec]


def main():
    args = parse_args()
    import numpy as np
    from PIL import Image

    from wavedm_tpu.utils.tpu_lock import acquire_tpu_lock
    acquire_tpu_lock('restore')
    import jax
    # honor JAX_PLATFORMS even where a device plugin ignores the env var
    # (the axon TPU plugin does; same workaround as tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from wavedm_tpu.config import load_config
    from wavedm_tpu.data.raindrop import eval_resize_dims
    from wavedm_tpu.inference.loader import build_restorer
    from wavedm_tpu.utils.images import save_image

    cfg = load_config(args.config, args.overrides)
    for name, val in (("t_start", args.t_start),
                      ("sampling_timesteps", args.sampling_timesteps),
                      ("init_ll", args.init_ll),
                      ("x0_pred_index", args.x0_pred_index),
                      ("grid_r", args.grid_r),
                      ("solver", args.solver)):
        if val is not None:
            setattr(cfg.sampling, name, val)
    cfg.validate()

    paths = list_inputs(args.input)
    if not paths:
        raise SystemExit(f"no inputs match {args.input!r}")
    os.makedirs(args.out, exist_ok=True)

    restorer = build_restorer(cfg, args.resume, args.hfrm_ckpt,
                              ema=args.ema)

    def load(path):
        img = Image.open(path)
        img = img.convert("RGB") if img.mode != "RGB" else img
        if args.no_resize:
            w, h = img.size
            wd, ht = 16 * ((w + 15) // 16), 16 * ((h + 15) // 16)
        else:
            wd, ht = eval_resize_dims(*img.size)
        if (wd, ht) != img.size:
            img = img.resize((wd, ht), Image.LANCZOS)
        return np.asarray(img, np.float32) / 255.0

    # geometry-bucketed batches: same-size images share a compiled program
    buckets = {}
    for p in paths:
        arr = load(p)
        buckets.setdefault(arr.shape, []).append((p, arr))

    rng = jax.random.PRNGKey(cfg.training.seed)
    n_done = 0
    t0 = time.time()
    for shape, items in buckets.items():
        for s in range(0, len(items), args.batch):
            chunk = items[s:s + args.batch]
            rng, sub = jax.random.split(rng)
            batch = np.stack([a for _, a in chunk])
            out, _ = restorer.restore_image(batch, sub)
            for (path, _), img in zip(chunk, out):
                name = os.path.splitext(os.path.basename(path))[0]
                save_image(img, os.path.join(args.out, f"{name}_restored.png"))
                n_done += 1
            print(f"[{n_done}/{len(paths)}] {shape[1]}x{shape[0]} "
                  f"batch of {len(chunk)} done "
                  f"({(time.time() - t0) / n_done:.2f} s/image incl. compile)")
    print(f"restored {n_done} images -> {args.out}")


if __name__ == "__main__":
    main()
