"""Sampling-seed variance study for the trained flagship chain (VERDICT r3
weak #3 / next-round item 4).

Round 3 saw psnr_bf16_b8 0.94 dB below psnr_bf16_b1 on the same image.  Two
hypotheses: (a) the full-from-noise 25-step chain simply has ~1 dB
noise-seed variance, making any single-seed PSNR anchor meaningless, or
(b) batched restoration diverges from per-image at trained weights.  This
tool separates them: per-element PSNRs at batch 1 (N seeds) vs batch 8
(N/8 batches, every element its own noise draw) must agree in MEAN if
batching is sound -- a batch defect shifts the b8 mean; seed variance widens
both spreads equally.  The t_start production chain is measured alongside
(expected far tighter: it starts from the HFRM LL, not pure noise).

Writes one JSON line:  python tools/seed_study.py [--seeds 16] [--out f]
"""

import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _stats(v):
    v = np.asarray(v, np.float64)
    return {"mean": round(float(v.mean()), 3),
            "std": round(float(v.std(ddof=1)), 3),
            "min": round(float(v.min()), 3),
            "max": round(float(v.max()), 3),
            "n": int(v.size)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=16)
    ap.add_argument("--out", default="results/r4_seed_study.json")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    metavar="SECTION.KEY=VALUE")
    args = ap.parse_args()

    from wavedm_tpu.utils.tpu_lock import acquire_tpu_lock
    acquire_tpu_lock('seed_study')
    import jax
    import jax.numpy as jnp  # noqa: F401

    from wavedm_tpu.config import load_config
    from wavedm_tpu.data.synthetic import SyntheticPairs
    from wavedm_tpu.inference.restoration import DiffusiveRestoration
    from wavedm_tpu.models.hfrm import HFRM
    from wavedm_tpu.models.unet import DiffusionUNet
    from wavedm_tpu.utils.checkpoint import (find_latest_checkpoint,
                                             load_checkpoint)
    from wavedm_tpu.utils.metrics import psnr_torch

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(
        repo, "wavedm_tpu/configs/raindrop_wavelet.yaml"),
        getattr(args, "overrides", []))
    latest = find_latest_checkpoint(os.path.join(repo, "saved_models/r3_ddpm"))
    assert latest, "trained r3 checkpoint required for this study"
    state, _ = load_checkpoint(latest)
    uparams = state.params
    hstate, _ = load_checkpoint(os.path.join(repo, "saved_models/r3_hfrm/best"))
    hparams = hstate.params

    pair_src = SyntheticPairs(seed=61 + 10_000, severity="heavy")
    cond, gt = pair_src[0]
    cond = cond[None]

    def build(t_start=0):
        c = copy.deepcopy(cfg)
        c.parallel.compute_dtype = args.dtype
        if t_start:
            c.sampling.t_start = t_start
            c.sampling.sampling_timesteps = 10
            c.sampling.x0_pred_index = -1
            c.sampling.init_ll = "hfrm"
        c.validate()
        u = DiffusionUNet.from_config(c)
        h = HFRM.from_config(c)
        return DiffusiveRestoration(c, u.apply, uparams, h.apply, hparams)

    out = {"checkpoint": latest, "dtype": args.dtype, "seeds": args.seeds}
    for label, t_start in (("full_25step", 0), ("tstart300_10step", 300)):
        r = build(t_start)
        b1 = []
        for s in range(args.seeds):
            o, _ = r.restore_image(cond, jax.random.PRNGKey(1000 + s))
            b1.append(float(psnr_torch(gt, o[0])))
        b8 = []
        c8 = np.repeat(cond, 8, axis=0)
        for s in range(max(1, args.seeds // 8)):
            o, _ = r.restore_image(c8, jax.random.PRNGKey(2000 + s))
            b8.extend(float(psnr_torch(gt, o[i])) for i in range(o.shape[0]))
        out[label] = {"b1": _stats(b1), "b8": _stats(b8),
                      "b8_minus_b1_mean": round(float(np.mean(b8) -
                                                      np.mean(b1)), 3)}
        print(label, out[label], flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
