#!/usr/bin/env python
"""Stage-1 HFRM pretraining (reference train_hfrm.py re-designed TPU-native).

Usage:
  python scripts/train_hfrm.py --config wavedm_tpu/configs/raindrop_wavelet.yaml
  python scripts/train_hfrm.py --config ... --smoke
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
    p.add_argument("--resume", default="")
    p.add_argument("--ckpt-dir", default="saved_models/raindrop")
    p.add_argument("--max-steps", type=int, default=0)
    p.add_argument("--smoke", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    import numpy as np

    from wavedm_tpu.config import load_config
    from wavedm_tpu.parallel.distributed import initialize_multihost
    from wavedm_tpu.training.hfrm_trainer import HFRMTrainer

    initialize_multihost()  # no-op single-process (reference train_hfrm is
    # single-process DataParallel; multi-host here shards the folder dataset)
    cfg = load_config(args.config, args.overrides)
    trainer = HFRMTrainer(cfg)
    if args.resume:
        trainer.resume(args.resume)

    if args.smoke:
        from wavedm_tpu.data.synthetic import SyntheticPairs
        src = SyntheticPairs(n_images=4, height=128, width=192)

        def batches(epoch):
            rng = np.random.default_rng(epoch)
            for _ in range(5):
                batch = np.empty((2, 128, 192, 6), np.float32)
                for b in range(2):
                    c, g = src[int(rng.integers(0, len(src)))]
                    batch[b, ..., :3] = c
                    batch[b, ..., 3:] = g
                yield batch

        trainer.fit(batches, max_steps=args.max_steps or 10,
                    ckpt_dir=args.ckpt_dir)
        print("smoke HFRM training done at step", int(trainer.state.step))
        return

    from wavedm_tpu.utils.tpu_lock import acquire_tpu_lock
    acquire_tpu_lock('train_hfrm')
    import jax
    from wavedm_tpu.data.raindrop import RainDropDataset

    train_dir = os.path.join(cfg.data.data_dir, "raindrop", "train")
    ds = RainDropDataset(train_dir, patch_size=0, patch_n=1,
                         parse_patches=False,
                         process_index=jax.process_index(),
                         process_count=jax.process_count())

    if cfg.data.device_cache:
        # One-time HBM upload of this host's split (uint8); per-step batches
        # are on-device gathers + casts -- zero host->device traffic per
        # step (and immunity to the axon relay's transfer-pinning leak; see
        # data/device_cache.py).  Requires a uniform image geometry, which
        # the 720x480 eval-resize rule guarantees.
        import jax.numpy as jnp
        pairs = [ds._eval_sample(i)[0] for i in range(len(ds))]
        shapes = {p.shape for p in pairs}
        if len(shapes) != 1:
            raise SystemExit(f"device_cache needs uniform sizes, got {shapes}")
        cache = jnp.asarray(
            np.stack([(p * 255.0 + 0.5).astype(np.uint8) for p in pairs]))
        del pairs

        def batches(epoch):
            rng = np.random.default_rng(cfg.training.seed + epoch)
            order = rng.permutation(cache.shape[0])
            bs = cfg.hfrm.batch_size
            for s in range(0, len(order) - bs + 1, bs):
                idx = jnp.asarray(order[s:s + bs])
                yield cache[idx].astype(jnp.float32) / 255.0
    else:
        def batches(epoch):
            buf = []
            for pair, _ in ds.epoch(epoch, cfg.training.seed):
                buf.append(pair)
                if len(buf) == cfg.hfrm.batch_size:
                    yield np.stack(buf)
                    buf = []

    trainer.fit(batches, max_steps=args.max_steps or None,
                ckpt_dir=args.ckpt_dir)


if __name__ == "__main__":
    main()
