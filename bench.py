"""Headline benchmark: RainDrop 720x480 restoration throughput, full 25-step
DDIM chain, one chip.

Measures the flagship WaveDM pipeline (HFRM -> Haar DWT -> tiled DDIM over
45 overlapping 64^2 wavelet patches -> IWT) end-to-end on the local
accelerator and compares against a faithful "reference-style execution" of
the SAME math on the SAME chip: a host-side Python loop over the 25 DDIM
steps with 8-patch micro-batches and per-step host round-trips, mirroring the
reference's CUDA execution strategy (models/ddm_wavelet.py:437-506,
utils/sampling.py:99-104).  vs_baseline is the speedup of the fused
TPU-native program over that execution model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

# The reference-style baseline is slow to measure (~2x218s incl. compile);
# cache it after the first measurement so routine bench runs only time the
# fused path.  Delete this file to force a re-measure.
_BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_BASELINE.json")


def main():
    import jax
    import jax.numpy as jnp

    from wavedm_tpu.config import load_config
    from wavedm_tpu.diffusion.sampling import (
        _count_mask,
        overlapping_grid_corners,
    )
    from wavedm_tpu.diffusion.schedules import alpha_bars, ddim_timesteps
    from wavedm_tpu.inference.restoration import DiffusiveRestoration
    from wavedm_tpu.models.hfrm import HFRM
    from wavedm_tpu.models.unet import DiffusionUNet
    from wavedm_tpu.data.synthetic import SyntheticPairs

    cfg = load_config("wavedm_tpu/configs/raindrop_wavelet.yaml")
    key = jax.random.PRNGKey(0)

    unet = DiffusionUNet.from_config(cfg)
    uparams = jax.jit(unet.init)(
        key, jnp.zeros((1, 64, 64, 96)), jnp.zeros((1,)))["params"]
    hfrm = HFRM.from_config(cfg)
    hparams = jax.jit(hfrm.init)(key, jnp.zeros((1, 480, 720, 3)))["params"]

    restorer = DiffusiveRestoration(cfg, unet.apply, uparams,
                                    hfrm.apply, hparams)

    cond, _ = SyntheticPairs()[0]
    cond = cond[None]  # (1, 480, 720, 3)

    # ---- fused TPU-native path ------------------------------------------
    out, _ = restorer.restore_image(cond)  # compile
    n_iter = 5
    t0 = time.time()
    for i in range(n_iter):
        out, _ = restorer.restore_image(cond, jax.random.PRNGKey(i))
    dt = (time.time() - t0) / n_iter
    ips = 1.0 / dt

    # ---- reference-style execution on the same chip ---------------------
    # Python DDIM loop, micro-batches of 8 patches, host sync each step.
    m = cfg.model
    hw, ww = 120, 180
    p = cfg.data.image_size
    corners = overlapping_grid_corners(hw, ww, p, cfg.sampling.grid_r)
    mask = _count_mask(corners, hw, ww, p)[None, :, :, None]
    seq = ddim_timesteps(cfg.diffusion.num_diffusion_timesteps,
                         cfg.sampling.sampling_timesteps)
    betas = restorer.betas
    abar = np.asarray(alpha_bars(betas))

    hfrm_fwd = jax.jit(lambda v, x: hfrm.apply({"params": v}, x))
    unet_fwd = jax.jit(lambda v, x, t: unet.apply({"params": v}, x, t))

    from wavedm_tpu.ops.wavelet import wavelet_dec
    dwt = jax.jit(lambda x: wavelet_dec(2.0 * x - 1.0))

    def reference_style_restore(cond_pixel, seed):
        cond_w = np.asarray(dwt(jnp.asarray(cond_pixel)))
        restored = np.asarray(hfrm_fwd(hparams, jnp.asarray(cond_pixel)))
        hfrm_w = np.asarray(dwt(jnp.asarray(restored)))
        x_other = hfrm_w[..., m.other_channels_begin:]
        rng = np.random.default_rng(seed)
        xt = rng.standard_normal((1, hw, ww, 3)).astype(np.float32)
        seq_next = [-1] + list(seq[:-1])
        for i, j in zip(reversed(list(seq)), reversed(seq_next)):
            at, at_next = abar[i + 1], abar[j + 1]
            acc = np.zeros((1, hw, ww, 3), np.float32)
            # crop all patches on host (reference crops with torchvision)
            cond_p = np.stack([cond_w[0, hi:hi + p, wi:wi + p] for hi, wi in corners])
            xt_p = np.stack([xt[0, hi:hi + p, wi:wi + p] for hi, wi in corners])
            oth_p = np.stack([x_other[0, hi:hi + p, wi:wi + p] for hi, wi in corners])
            inp = np.concatenate([cond_p, xt_p, oth_p], axis=-1)
            for s in range(0, len(corners), 8):
                chunk = inp[s:s + 8]
                et = np.asarray(unet_fwd(
                    uparams, jnp.asarray(chunk),
                    jnp.full((chunk.shape[0],), float(i))))  # host sync
                for k, (hi, wi) in enumerate(corners[s:s + 8]):
                    acc[0, hi:hi + p, wi:wi + p] += et[k]
            et_full = acc / mask
            x0 = (xt - et_full * np.sqrt(1 - at)) / np.sqrt(at)
            xt = np.sqrt(at_next) * x0 + np.sqrt(1 - at_next) * et_full
        return xt

    if os.path.exists(_BASELINE_CACHE):
        with open(_BASELINE_CACHE) as f:
            ref_dt = json.load(f)["reference_style_s_per_image"]
    else:
        reference_style_restore(cond, 0)  # compile the 8-patch forward
        t0 = time.time()
        reference_style_restore(cond, 1)
        ref_dt = time.time() - t0
        with open(_BASELINE_CACHE, "w") as f:
            json.dump({"reference_style_s_per_image": ref_dt,
                       "backend": jax.default_backend()}, f)
    ref_ips = 1.0 / ref_dt

    result = {
        "metric": "RainDrop 720x480 restoration, 25-step DDIM, flagship WaveDM",
        "value": round(ips, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / ref_ips, 2),
        "detail": {
            "fused_ms_per_image": round(dt * 1000, 1),
            "reference_style_ms_per_image": round(ref_dt * 1000, 1),
            "baseline": "same math, reference execution strategy (host-loop "
                        "DDIM, 8-patch micro-batches, per-step host sync) on "
                        "the same chip; NOTE on tunneled-TPU setups the "
                        "baseline additionally pays a network round-trip per "
                        "dispatch, which inflates the ratio beyond the pure "
                        "fusion win",
            "n_patches": len(corners),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
