#!/usr/bin/env python
"""Materialize the synthetic raindrop task as an on-disk dataset with the
reference's RainDrop layout (datasets/raindrop.py:22-33):

  <data_dir>/raindrop/train/{input,gt}/*.png
  <data_dir>/raindrop/raindrop_test/{input,gt}/*.png

so the REAL pipelines (folder listing, PIL/native decode, n-crop sampling,
720x480 eval rule) run end-to-end when no real RainDrop data is present --
the dress-rehearsal protocol's stand-in dataset.

Usage: python tools/make_synthetic_dataset.py [--data-dir ./data]
       [--n-train 32] [--n-test 8] [--seed 0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default="./data")
    ap.add_argument("--n-train", type=int, default=32)
    ap.add_argument("--n-test", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--severity", default="heavy", choices=["light", "heavy"],
                    help="degradation strength (heavy: ~20 dB input PSNR)")
    args = ap.parse_args()

    from PIL import Image

    from wavedm_tpu.data.synthetic import SyntheticPairs

    base = os.path.join(args.data_dir, "raindrop")
    jobs = [("train", args.n_train, args.seed),
            ("raindrop_test", args.n_test, args.seed + 10_000)]
    for split, n, seed in jobs:
        src = SyntheticPairs(n_images=n, seed=seed, severity=args.severity)
        for sub in ("input", "gt"):
            os.makedirs(os.path.join(base, split, sub), exist_ok=True)
        for i in range(n):
            cond, gt = src[i]
            # reference naming: gt name derives from input name by prefix
            # (datasets/raindrop.py), our _list_pairs matches sorted listings
            for sub, arr in (("input", cond), ("gt", gt)):
                img = Image.fromarray(
                    np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8))
                img.save(os.path.join(base, split, sub, f"{i:04d}.png"))
        print(f"{split}: wrote {n} pairs under {os.path.join(base, split)}")


if __name__ == "__main__":
    main()
