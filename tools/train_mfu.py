"""Training-step MFU for the flagship diffusion run (VERDICT r3 item 8).

Compiles the EXACT r3 train step (156M UNet fwd+bwd + frozen HFRM-in-loop
conditioning + Adam + EMA, 16x256^2 pixel crops -> 64^2 wavelet) and reports
XLA's cost-analysis FLOPs; divided by the measured wall step time this gives
the training-side MFU.  Run on CPU for the FLOP count (the compiled HLO
flops are backend-portable at this granularity) and pass the step time
measured on the TPU (results/r3_ddpm_train.log prints it every 10 steps).

  python tools/train_mfu.py --step-time 0.186 [--dtype float32]

Prints one JSON line with flops/step, achieved FLOP/s and MFU vs the v5e
bf16 peak (197e12; f32 convs ride the MXU as bf16 passes at default
precision -- PERF.md round-2 finding).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-time", type=float, required=True,
                    help="measured seconds/step on the target chip")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--batch-size", type=int, default=None,
                    help="override training.batch_size (images/step; "
                         "crops/step = batch_size * patch_n)")
    ap.add_argument("--peak", type=float, default=197e12,
                    help="chip peak FLOP/s for the MFU denominator")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend for the FLOP count (the "
                         "axon TPU plugin ignores JAX_PLATFORMS=cpu; this "
                         "uses jax.config, which it honors)")
    args = ap.parse_args()

    if not args.cpu:
        from wavedm_tpu.utils.tpu_lock import acquire_tpu_lock
        acquire_tpu_lock("train_mfu")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wavedm_tpu.config import load_config
    from wavedm_tpu.models.hfrm import HFRM
    from wavedm_tpu.models.unet import DiffusionUNet
    from wavedm_tpu.training.state import create_train_state
    from wavedm_tpu.training.train_step import make_train_step

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo,
                                   "wavedm_tpu/configs/rehearsal_flagship.yaml"))
    cfg.parallel.compute_dtype = args.dtype
    if args.batch_size is not None:
        cfg.training.batch_size = args.batch_size
    cfg.validate()

    key = jax.random.PRNGKey(0)
    unet = DiffusionUNet.from_config(cfg)
    p = cfg.data.patch_size
    wp = p // 4
    uparams = jax.jit(unet.init)(
        key, jnp.zeros((1, wp, wp, 96)), jnp.zeros((1,)))["params"]
    hfrm = HFRM.from_config(cfg)
    hparams = jax.jit(hfrm.init)(key, jnp.zeros((1, p, p, 3)))["params"]
    hfrm_fn = lambda x: hfrm.apply({"params": hparams}, x)

    state = create_train_state(uparams, cfg.optim, key)
    step = make_train_step(cfg, unet.apply, hfrm_fn=hfrm_fn, donate=False)

    n = cfg.training.patch_n * cfg.training.batch_size
    batch = jnp.zeros((n, p, p, 6), jnp.float32)
    compiled = step.lower(state, batch).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    achieved = flops / args.step_time
    print(json.dumps({
        "train_flops_per_step": flops,
        "batch": [int(n), int(p), int(p), 6],
        "compute_dtype": args.dtype,
        "step_time_s": args.step_time,
        "achieved_flops_per_s": achieved,
        "peak_flops_per_s": args.peak,
        "train_mfu": round(achieved / args.peak, 4),
        "backend_used_for_flop_count": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
