#!/usr/bin/env python
"""Roofline analysis of the restoration hot path (VERDICT r2 item 3).

For the headline configuration's UNet forward (the tiled DDIM chain is
25 x this + epsilon), pulls XLA's compiled cost analysis (FLOPs and HBM
bytes accessed) and computes the two lower bounds

    t_compute = flops / peak_flops        (MXU-bound)
    t_memory  = bytes / hbm_bandwidth     (bandwidth-bound)

then compares max(t_compute, t_memory) with the measured kernel time to
show how close the program runs to ITS OWN roofline -- i.e. whether the
remaining gap to 100% MFU is claimable by scheduling or is structural
(bytes that must move at this model's arithmetic intensity).

Usage: python tools/roofline.py [--batch 8] [--dtype bfloat16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# v5e single-chip peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM
PEAKS = {
    "TPU v5e": (197e12, 819e9),
    "TPU v5 lite": (197e12, 819e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v6e": (918e12, 1640e9),
}


def cost(jitted, *args):
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return (float(ca.get("flops", 0.0)),
            float(ca.get("bytes accessed", 0.0)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8, help="images per program")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--fused", action="store_true",
                    help="enable the Pallas fused ResnetBlock prefix "
                         "(parallel.fused_resblock)")
    args = ap.parse_args()

    from wavedm_tpu.utils.tpu_lock import acquire_tpu_lock
    acquire_tpu_lock('roofline')
    import jax
    import jax.numpy as jnp

    from wavedm_tpu.config import load_config
    from wavedm_tpu.models.unet import DiffusionUNet

    cfg = load_config("wavedm_tpu/configs/raindrop_wavelet.yaml")
    cfg.parallel.compute_dtype = args.dtype
    cfg.parallel.fused_resblock = args.fused
    model = DiffusionUNet.from_config(cfg)
    key = jax.random.PRNGKey(0)
    K = 45 * args.batch  # 45-patch grid x image batch
    params = jax.jit(model.init)(
        key, jnp.zeros((1, 64, 64, 96)), jnp.zeros((1,)))["params"]
    x = jax.random.normal(key, (K, 64, 64, 96), jnp.float32)
    t = jnp.zeros((K,), jnp.float32)

    fwd = jax.jit(lambda v, x, t: model.apply({"params": v}, x, t))
    flops, bytes_acc = cost(fwd, params, x, t)

    out = fwd(params, x, t)
    float(jnp.asarray(out).ravel()[0])  # sync (relay-safe)
    t0 = time.time()
    for _ in range(args.iters):
        out = fwd(params, x, t)
        float(jnp.asarray(out).ravel()[0])
    dt = (time.time() - t0) / args.iters

    kind = jax.devices()[0].device_kind
    peak_f, peak_b = next(
        (v for k, v in PEAKS.items() if kind.startswith(k)), (None, None))
    print(f"device: {kind}   batch: {args.batch} images "
          f"({K} patches)   dtype: {args.dtype}   fused: {args.fused}")
    print(f"flops/call: {flops:.3e}   bytes/call: {bytes_acc:.3e}   "
          f"arithmetic intensity: {flops / max(bytes_acc, 1):.1f} flop/byte")
    print(f"measured: {dt * 1e3:.1f} ms/call  "
          f"({flops / dt / 1e12:.1f} TFLOP/s achieved)")
    if peak_f:
        t_c = flops / peak_f
        t_m = bytes_acc / peak_b
        bound = max(t_c, t_m)
        print(f"t_compute: {t_c * 1e3:.1f} ms   t_memory: {t_m * 1e3:.1f} ms "
              f"-> roofline bound {bound * 1e3:.1f} ms "
              f"({'memory' if t_m > t_c else 'compute'}-bound)")
        print(f"MFU vs peak: {flops / dt / peak_f:.3f}   "
              f"roofline-attainable MFU: {flops / bound / peak_f:.3f}   "
              f"fraction of own roofline achieved: {bound / dt:.3f}")


if __name__ == "__main__":
    main()
