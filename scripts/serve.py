#!/usr/bin/env python
"""Serve restoration over HTTP with device microbatching.

Long-running serving entry point (the reference has none -- its inference
requires a ground-truth folder and exits).  One device-owner thread keeps
the fused restoration program's batch axis full; concurrent POSTs of
same-geometry images share one TPU program invocation.

  python scripts/serve.py --config wavedm_tpu/configs/raindrop_wavelet_production.yaml \
      --resume <ckpt> --hfrm-ckpt <ckpt> --port 8000 [--batch 8] [--window-ms 30]

  curl -s -X POST --data-binary @degraded.png localhost:8000/restore > restored.png
  curl -s localhost:8000/healthz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE")
    p.add_argument("--resume", required=True)
    p.add_argument("--hfrm-ckpt", default="")
    p.add_argument("--ema", action="store_true")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--window-ms", type=float, default=30.0)
    p.add_argument("--no-resize", action="store_true")
    p.add_argument("--t-start", type=int, default=None)
    p.add_argument("--sampling-timesteps", type=int, default=None)
    p.add_argument("--init-ll", default=None,
                   choices=["hfrm", "cond", "noise"])
    p.add_argument("--solver", default=None, choices=["ddim", "dpmpp2m"],
                   help="reverse-chain update rule (sampling.solver)")
    p.add_argument("--x0-pred-index", type=int, default=None)
    p.add_argument("--grid-r", type=int, default=None)
    p.add_argument("--warmup", action="store_true",
                   help="compile the canonical 720x480 geometry at startup")
    p.add_argument("--patch-shard", action="store_true",
                   help="shard the tiled sampler's patch batch over ALL "
                        "local devices (patch-parallel serving)")
    return p.parse_args()


def main():
    args = parse_args()
    from wavedm_tpu.utils.tpu_lock import acquire_tpu_lock
    acquire_tpu_lock("serve")
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from wavedm_tpu.config import load_config
    from wavedm_tpu.inference.loader import build_restorer
    from wavedm_tpu.inference.server import RestorationServer

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

    mesh = None
    if args.patch_shard:
        import numpy as np
        from jax.sharding import Mesh
        from wavedm_tpu.parallel.mesh import DATA_AXIS
        mesh = Mesh(np.asarray(jax.devices()), (DATA_AXIS,))
        print(f"patch-parallel serving over {mesh.size} devices")

    restorer = build_restorer(cfg, args.resume, args.hfrm_ckpt,
                              ema=args.ema, mesh=mesh)
    server = RestorationServer(restorer, batch=args.batch,
                               window_ms=args.window_ms,
                               no_resize=args.no_resize,
                               rng_seed=cfg.training.seed)
    if args.warmup:
        import numpy as np
        import time
        t0 = time.time()
        restorer.restore_image(
            np.zeros((args.batch, 480, 720, 3), np.float32))
        print(f"warmup (batch {args.batch}, 720x480): "
              f"{time.time() - t0:.1f}s")

    httpd = server.serve(args.host, args.port)
    print(f"serving restoration on {args.host}:{args.port} "
          f"(batch {args.batch}, window {args.window_ms} ms)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
