"""CPU-scale eps-vs-v A/B: does v-prediction fix the high-t conditioning hole?

Mechanism study at toy scale (16x16 conditional restoration, tiny UNet,
CPU) -- the chip-scale rehearsal A/B is scripts/r5_vpred_ab.sh; this one
runs anywhere in minutes and probes the DIAGNOSED failure directly
(README "Quality loop"): an eps-parameterized conditional model converges
teacher-forced at low/mid t but never learns to USE the conditioning at
t>=800 (the eps target degenerates to x_t), so a full-T DDIM chain from
noise starts with ~15 wasted steps.  v-prediction's target degenerates to
-x0 there instead.

Protocol: identical data/seeds/steps for both arms.
  * teacher-forced implied-x0 MSE at a t-ladder (the conditioning probe),
  * 25-step DDIM chain from pure noise (the reference protocol shape),
  * oracle = cond-only baseline MSE for scale.

Writes one JSON line + a small markdown table.
  python tools/vpred_cpu_ab.py [--steps 1500] [--out results/vpred_cpu_ab.json]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np


def make_data(n, hw, rng):
    """Synthetic conditional restoration pairs: smooth gt, degraded cond."""
    base = rng.standard_normal((n, hw * 2, hw * 2, 3)).astype(np.float32)
    # smooth by 4x4 average-pool -> upsample (cheap "natural" images)
    gt = base.reshape(n, hw, 2, hw, 2, 3).mean((2, 4))
    gt = (gt - gt.min((1, 2, 3), keepdims=True)) / np.ptp(
        gt, axis=(1, 2, 3)).reshape(-1, 1, 1, 1)
    haze = rng.uniform(0.2, 0.5, (n, 1, 1, 1)).astype(np.float32)
    noise = 0.05 * rng.standard_normal(gt.shape).astype(np.float32)
    cond = np.clip(gt * (1 - haze) + haze * 0.8 + noise, 0, 1)
    return np.concatenate([cond, gt], axis=-1)  # (n, hw, hw, 6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--hw", type=int, default=16)
    ap.add_argument("--out", default="results/vpred_cpu_ab.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wavedm_tpu.config import load_config
    from wavedm_tpu.diffusion.sampling import ddim_sample
    from wavedm_tpu.diffusion.schedules import (alpha_bars, ddim_timesteps,
                                                get_beta_schedule)
    from wavedm_tpu.models.unet import DiffusionUNet
    from wavedm_tpu.training.state import create_train_state
    from wavedm_tpu.training.train_step import (data_transform,
                                                inverse_data_transform,
                                                make_train_step)

    hw = args.hw
    cfg = load_config("wavedm_tpu/configs/raindrop.yaml")
    cfg.data.image_size = hw
    cfg.data.patch_size = hw          # identity crop: data IS the patch
    cfg.model.ch = 32
    cfg.model.ch_mult = [1, 2]
    cfg.model.attn_resolutions = [8]
    cfg.model.num_res_blocks = 1
    cfg.training.batch_size = 16
    cfg.validate()

    rng_np = np.random.default_rng(7)
    train = make_data(256, hw, rng_np)
    test = make_data(32, hw, rng_np)
    betas = jnp.asarray(get_beta_schedule(
        cfg.diffusion.beta_schedule, beta_start=cfg.diffusion.beta_start,
        beta_end=cfg.diffusion.beta_end,
        num_diffusion_timesteps=cfg.diffusion.num_diffusion_timesteps),
        jnp.float32)
    abar = np.asarray(alpha_bars(betas))[1:]   # abar[t], t=0..T-1
    seq = ddim_timesteps(cfg.diffusion.num_diffusion_timesteps, 25)

    results = {}
    for arm in ("eps", "v"):
        cfg_a = dataclasses.replace(cfg)
        cfg_a.training.pred_type = arm
        model = DiffusionUNet.from_config(cfg_a)
        key = jax.random.PRNGKey(0)
        params = model.init(key, jnp.zeros((1, hw, hw, 6)),
                            jnp.zeros((1,)))["params"]
        state = create_train_state(params, cfg_a.optim, key)
        step = make_train_step(cfg_a, model.apply, donate=False)
        t0 = time.time()
        order = np.random.default_rng(1)
        bs = cfg_a.training.batch_size
        for i in range(args.steps):
            idx = order.integers(0, len(train), bs)
            state, m = step(state, jnp.asarray(train[idx]))
        train_s = time.time() - t0
        loss = float(m.loss)

        params_t = state.ema
        test_j = data_transform(jnp.asarray(test))
        cond_t, gt_t = test_j[..., :3], test_j[..., 3:]

        # teacher-forced implied-x0 MSE at a t ladder
        tf = {}
        e = jax.random.normal(jax.random.PRNGKey(3), gt_t.shape)
        for t in (200, 500, 800, 900, 960, 990):
            a = float(abar[t])
            xt = gt_t * np.sqrt(a) + e * np.sqrt(1 - a)
            out = model.apply({"params": params_t},
                              jnp.concatenate([cond_t, xt], -1),
                              jnp.full((xt.shape[0],), float(t)))
            if arm == "v":
                x0 = np.sqrt(a) * xt - np.sqrt(1 - a) * out
            else:
                x0 = (xt - out * np.sqrt(1 - a)) / np.sqrt(a)
            tf[t] = round(float(jnp.mean(jnp.square(x0 - gt_t))), 4)

        # full 25-step DDIM chain from pure noise (reference protocol)
        def model_fn(x, t):
            return model.apply({"params": params_t}, x, t)
        gt01 = jnp.asarray(test[..., 3:])

        def chain_psnr(x_init, chain_seq, solver="ddim"):
            x_final, _ = ddim_sample(model_fn, x_init, cond_t, chain_seq,
                                     betas, pred_type=arm, solver=solver)
            mse = float(jnp.mean(jnp.square(
                inverse_data_transform(x_final) - gt01)))
            return round(-10 * np.log10(mse), 2), round(mse, 5)

        noise = jax.random.normal(jax.random.PRNGKey(4), gt_t.shape)
        full_psnr, full_mse = chain_psnr(noise, seq)
        # solver dial: can 10-step dpmpp2m match the 25-step DDIM chain?
        seq10 = ddim_timesteps(cfg.diffusion.num_diffusion_timesteps, 10)
        dpm10_psnr, _ = chain_psnr(noise, seq10, solver="dpmpp2m")
        ddim10_psnr, _ = chain_psnr(noise, seq10)
        # truncated refinement from the degraded cond (t_start=300, 10
        # steps -- the production profile shape, init_ll=cond since the
        # toy task has no stage-1 restorer)
        t_start = 300
        seq_t = np.arange(0, t_start, t_start // 10, dtype=np.int32)
        a_s = float(abar[int(seq_t[-1])])
        x_t300 = cond_t * np.sqrt(a_s) + noise * np.sqrt(1 - a_s)
        t300_psnr, t300_mse = chain_psnr(x_t300, seq_t)
        results[arm] = {"final_train_loss": round(loss, 2),
                        "train_s": round(train_s, 1),
                        "teacher_forced_x0_mse": tf,
                        "chain25_mse": full_mse,
                        "chain25_psnr_db": full_psnr,
                        "chain10_ddim_psnr_db": ddim10_psnr,
                        "chain10_dpmpp2m_psnr_db": dpm10_psnr,
                        "t300_s10_mse": t300_mse,
                        "t300_s10_psnr_db": t300_psnr}

    cond01 = test[..., :3]
    results["degraded_input_psnr_db"] = round(float(
        -10 * np.log10(np.mean((cond01 - test[..., 3:]) ** 2))), 2)
    results["steps"] = args.steps
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
