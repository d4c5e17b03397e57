#!/usr/bin/env python
"""Teacher-forced probe: eps-MSE and implied-x0-MSE per timestep bucket.

Separates "the model can't predict eps" (capacity/training) from "the DDIM
rollout compounds small errors" (exposure bias): feeds TRUE x_t at a ladder
of t values and reports per-element eps MSE and x0 MSE, on train-distribution
crops from train or test images.

Usage: python tools/diag_teacher_forced.py --config ... --resume ... \
         --hfrm-ckpt ... [--split test]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--resume", required=True)
    ap.add_argument("--hfrm-ckpt", required=True)
    ap.add_argument("--split", default="test", choices=["train", "test"])
    ap.add_argument("--n-crops", type=int, default=16)
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    metavar="SECTION.KEY=VALUE")
    args = ap.parse_args()

    from wavedm_tpu.utils.tpu_lock import acquire_tpu_lock
    acquire_tpu_lock('diag_teacher_forced')
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavedm_tpu.config import load_config
    from wavedm_tpu.data.raindrop import RainDropDataset
    from wavedm_tpu.models.hfrm import HFRM
    from wavedm_tpu.models.unet import DiffusionUNet
    from wavedm_tpu.ops.wavelet import wavelet_dec
    from wavedm_tpu.training.train_step import data_transform
    from wavedm_tpu.utils.checkpoint import load_checkpoint
    from scripts.train_diffusion import load_hfrm_params

    cfg = load_config(args.config, getattr(args, 'overrides', []))
    m = cfg.model
    unet = DiffusionUNet.from_config(cfg)
    state, _ = load_checkpoint(args.resume)
    uparams = state.ema if args.ema else state.params
    hfrm = HFRM.from_config(cfg)
    hfrm_params = load_hfrm_params(args.hfrm_ckpt, cfg)

    root = os.path.join(cfg.data.data_dir, "raindrop",
                        "train" if args.split == "train" else "raindrop_test")
    p = cfg.data.patch_size
    ds = RainDropDataset(root, p, args.n_crops, parse_patches=True)
    rng_np = np.random.default_rng(0)
    crops = ds._train_sample(0, rng_np)  # (n, p, p, 6)

    x = jnp.asarray(crops)
    cond_w = wavelet_dec(data_transform(x[..., :3]))
    gt_w = wavelet_dec(data_transform(x[..., 3:]))
    restored = hfrm.apply({"params": hfrm_params}, x[..., :3])
    hfrm_w = wavelet_dec(data_transform(restored))
    x_tar = gt_w[..., :m.pred_channels]
    other = hfrm_w[..., m.other_channels_begin:]

    from wavedm_tpu.diffusion.schedules import get_beta_schedule
    betas = jnp.asarray(get_beta_schedule(
        cfg.diffusion.beta_schedule, beta_start=cfg.diffusion.beta_start,
        beta_end=cfg.diffusion.beta_end,
        num_diffusion_timesteps=cfg.diffusion.num_diffusion_timesteps))
    abar = jnp.cumprod(1.0 - betas)

    print(f"gt LL var {float(jnp.var(x_tar)):.4f}  "
          f"cond LL mse {float(jnp.mean((cond_w[..., :3] - x_tar) ** 2)):.4f}  "
          f"hfrm LL mse {float(jnp.mean((hfrm_w[..., :3] - x_tar) ** 2)):.4f}")

    @jax.jit
    def probe(t_scalar, key):
        a = abar[t_scalar]
        e = jax.random.normal(key, x_tar.shape)
        xt = x_tar * jnp.sqrt(a) + e * jnp.sqrt(1 - a)
        inp = jnp.concatenate([cond_w, xt, other], axis=-1)
        n = inp.shape[0]
        out = unet.apply({"params": uparams}, inp,
                         jnp.full((n,), t_scalar, jnp.float32))
        if cfg.training.pred_type == "v":
            # v-parameterized checkpoint: convert to the implied epsilon
            et = jnp.sqrt(1 - a) * xt + jnp.sqrt(a) * out
        else:
            et = out
        x0_hat = (xt - et * jnp.sqrt(1 - a)) / jnp.sqrt(a)
        return (jnp.mean((et - e) ** 2), jnp.mean((x0_hat - x_tar) ** 2))

    key = jax.random.PRNGKey(0)
    print(f"{'t':>5} {'eps_mse':>9} {'x0_mse':>9}")
    for t in [10, 40, 100, 200, 300, 400, 600, 800, 960]:
        key, sub = jax.random.split(key)
        em, xm = probe(jnp.asarray(t), sub)
        print(f"{t:>5} {float(em):>9.4f} {float(xm):>9.4f}")


if __name__ == "__main__":
    main()
