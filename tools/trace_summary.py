#!/usr/bin/env python
"""Summarize a jax.profiler trace: top ops by device self-time.

Usage: python tools/trace_summary.py <trace_dir> [--top 25]

<trace_dir> is the directory passed to WAVEDM_TRACE_DIR / xla_trace; the
perfetto trace is found under plugins/profile/*/ *.trace.json.gz.  Prints a
per-op-category table (fusion, convolution, copy, all-reduce, ...) and the
top individual ops so a bench regression can be attributed without a
TensorBoard UI.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def find_trace(trace_dir: str) -> str:
    pats = [os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz"),
            os.path.join(trace_dir, "**", "*.trace.json.gz")]
    for pat in pats:
        hits = sorted(glob.glob(pat, recursive=True))
        if hits:
            return hits[-1]
    raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    path = find_trace(args.trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device lanes: pid names containing "TPU"/"GPU"/"/device:"
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if any(k in n for k in ("TPU", "GPU", "/device:", "XLA"))}

    op_time = collections.Counter()
    cat_time = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        op_time[name] += dur
        total += dur
        head = name.split(".")[0].split("(")[0]
        for cat in ("fusion", "convolution", "copy", "all-reduce",
                    "all-gather", "reduce-scatter", "dot", "custom-call",
                    "dynamic-update-slice", "dynamic-slice", "scatter",
                    "gather", "transpose", "reduce", "bitcast"):
            if cat in head:
                head = cat
                break
        cat_time[head] += dur

    if not op_time:
        print("no device events found; lanes seen:",
              sorted(set(pid_names.values())))
        sys.exit(1)

    print(f"trace: {path}")
    print(f"device busy time: {total/1e3:.1f} ms\n")
    print("== by category ==")
    for name, t in cat_time.most_common(15):
        print(f"{t/1e3:10.1f} ms  {100*t/total:5.1f}%  {name}")
    print(f"\n== top {args.top} ops ==")
    for name, t in op_time.most_common(args.top):
        print(f"{t/1e3:10.1f} ms  {100*t/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
