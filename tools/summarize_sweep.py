"""Summarize an eval-sweep directory (scripts/r3_eval_sweep.sh output) into
one JSON + a markdown table ready for README.

Each row log is the grep-filtered stdout of scripts/eval_diffusion.py:

    psnr all torch 30.54
    psnr all np 30.54
    psnr all GPU 30.55
    ssim all 0.912
    (8 images)

Run:  python tools/summarize_sweep.py [--dir results/r4_sweep] [--out f.json]
"""

import argparse
import glob
import json
import os
import re
import sys

_METRICS = {
    "psnr_torch": re.compile(r"psnr all torch\s+([-\d.]+)"),
    "psnr_np_y": re.compile(r"psnr all np\s+([-\d.]+)"),
    "psnr_y": re.compile(r"psnr all GPU\s+([-\d.]+)"),
    "ssim": re.compile(r"ssim all\s+([-\d.]+)"),
    "n_images": re.compile(r"\((\d+) images\)"),
}


def parse_log(path):
    text = open(path).read()
    row = {}
    for key, rx in _METRICS.items():
        m = rx.search(text)
        if m:
            row[key] = float(m.group(1)) if key != "n_images" else int(
                m.group(1))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="results/r4_sweep")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    rows = {}
    for path in sorted(glob.glob(os.path.join(args.dir, "*.log"))):
        name = os.path.splitext(os.path.basename(path))[0]
        if name.endswith(".full"):   # raw row transcript, not the summary
            continue
        if name == "diag":
            continue
        row = parse_log(path)
        if row:
            rows[name] = row

    if not rows:
        print(f"no parsable rows in {args.dir}", file=sys.stderr)
        sys.exit(1)

    out = args.out or os.path.join(args.dir, "summary.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)

    print("| Row | PSNR-Y (torch) | SSIM | n |")
    print("|---|---|---|---|")
    for name, row in sorted(rows.items()):
        print(f"| {name} | {row.get('psnr_torch', float('nan')):.2f} dB "
              f"| {row.get('ssim', float('nan')):.3f} "
              f"| {row.get('n_images', '?')} |")
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
