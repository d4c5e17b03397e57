#!/usr/bin/env python
"""Train the (wavelet-domain) conditional diffusion model.

TPU-native replacement for the reference launcher pair
(train_weather_script.py -> torch.distributed.launch -> train_diffusion.py):
one process drives all local devices through a jax.sharding.Mesh; multi-host
runs initialize jax.distributed and shard the input pipeline per process.

Usage:
  python scripts/train_diffusion.py --config wavedm_tpu/configs/raindrop_wavelet.yaml
  python scripts/train_diffusion.py --config ... --smoke     # synthetic data
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="Path to YAML config")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE",
                   help="config override, repeatable (YAML-parsed value)")
    p.add_argument("--resume", default="", help="Checkpoint to resume from")
    p.add_argument("--ckpt-dir", default="", help="Checkpoint output dir "
                   "(default <data_dir>/ckpts)")
    p.add_argument("--max-steps", type=int, default=0,
                   help="Stop after N steps (0 = run n_epochs)")
    p.add_argument("--smoke", action="store_true",
                   help="Synthetic data, 20 steps, no mesh requirement")
    p.add_argument("--hfrm-ckpt", default="",
                   help="Frozen HFRM checkpoint (needed when "
                        "use_gt_in_train=False); .pth loads via torch_compat")
    p.add_argument("--seed", type=int, default=None)
    return p.parse_args()


def load_hfrm_params(path, cfg):
    # single implementation shared with the inference entry points
    from wavedm_tpu.inference.loader import load_hfrm_params as _load
    return _load(path, cfg)


def main():
    args = parse_args()
    from wavedm_tpu.config import load_config
    from wavedm_tpu.parallel.distributed import initialize_multihost
    from wavedm_tpu.training.trainer import DiffusionTrainer

    # multi-host rendezvous before any device use (the reference's
    # unconditional dist.init_process_group, train_diffusion.py:62-66,80);
    # no-op for the common single-process case
    initialize_multihost()
    cfg = load_config(args.config, args.overrides)
    if args.seed is not None:
        cfg.training.seed = args.seed

    hfrm_params = load_hfrm_params(args.hfrm_ckpt or cfg.hfrm.ckpt_path, cfg)
    trainer = DiffusionTrainer(cfg, hfrm_params=hfrm_params)
    if args.resume == "auto":
        from wavedm_tpu.utils.checkpoint import find_latest_checkpoint
        latest = find_latest_checkpoint(
            args.ckpt_dir or os.path.join(cfg.data.data_dir, "ckpts"))
        if latest:
            trainer.resume(latest)
        else:
            print("=> --resume auto: no checkpoint found, starting fresh")
    elif args.resume:
        trainer.resume(args.resume)

    if args.smoke:
        import numpy as np
        from wavedm_tpu.data.synthetic import SyntheticPairs
        src = SyntheticPairs(n_images=4, seed=cfg.training.seed)
        p = cfg.data.patch_size

        def batches(epoch):
            rng = np.random.default_rng(epoch)
            for _ in range(10):
                crops = np.empty((cfg.training.patch_n, p, p, 6), np.float32)
                cond, gt = src[int(rng.integers(0, len(src)))]
                for k in range(cfg.training.patch_n):
                    y = rng.integers(0, cond.shape[0] - p)
                    x = rng.integers(0, cond.shape[1] - p)
                    crops[k, ..., :3] = cond[y:y + p, x:x + p]
                    crops[k, ..., 3:] = gt[y:y + p, x:x + p]
                if cfg.data.global_attn:
                    yield crops, cond[None]
                else:
                    yield crops

        trainer.fit(batches, max_steps=args.max_steps or 20)
        print("smoke training done at step", int(trainer.state.step))
        return

    import itertools

    from wavedm_tpu.utils.tpu_lock import acquire_tpu_lock
    acquire_tpu_lock('train_diffusion')
    import jax
    from wavedm_tpu.data.raindrop import RainDrop
    dataset = RainDrop(cfg, jax.process_index(), jax.process_count())
    ckpt_dir = args.ckpt_dir or os.path.join(cfg.data.data_dir, "ckpts")

    # ONE restorer for the whole run: its per-geometry jit cache survives
    # across validate() calls (params flow as jit arguments), so the 25-step
    # chain compiles once per geometry instead of once per validation
    restorer_box = {}

    def validate(state, step):
        # in-train restoration snapshot on a couple of val images, process 0
        # (reference models/ddm_wavelet.py:275-280)
        from wavedm_tpu.inference.restoration import DiffusiveRestoration
        from wavedm_tpu.models.hfrm import HFRM

        hfrm_apply = None
        hp = hfrm_params
        if cfg.data.wavelet and not cfg.data.wavelet_in_unet:
            if hp is None:
                print(f"[validate @ {step}] skipped: no HFRM checkpoint")
                return
            hfrm_apply = HFRM.from_config(cfg).apply
        if "r" not in restorer_box:
            restorer_box["r"] = DiffusiveRestoration(
                cfg, trainer.model.apply, state.params, hfrm_apply, hp)
        restorer = restorer_box["r"]
        restorer.unet_params = state.params
        res = restorer.restore(
            itertools.islice(dataset.eval_samples(), 2),
            save_dir=os.path.join("results", "images", f"step{step}"))
        print(f"[validate @ {step}] psnr {res['psnr_torch']:.3f} "
              f"ssim {res['ssim']:.4f}")

    trainer.fit(lambda epoch: dataset.train_batches(epoch),
                max_steps=args.max_steps or None, ckpt_dir=ckpt_dir,
                validate_fn=validate)


if __name__ == "__main__":
    main()
