"""Full-image diffusive restoration (the eval/serving pipeline).

Re-designs the reference ``DiffusiveRestoration`` (models/restoration.py:16-196)
as ONE fused jitted program per eval geometry: for each image,

  pixel cond -> [-1,1] -> Haar DWT -> 48 cond channels
  HFRM(cond) -> [-1,1] -> DWT -> 45 high-frequency conditioning channels
  tiled 25-step DDIM over 64^2 wavelet patches (stride grid_r, eps averaged
  on the static count mask) -> x0 trajectory
  output := x0_preds[x0_pred_index]   (reference uses -5, restoration.py:108)
  [diffusion LL(3) | HFRM HF(45)] -> IWT -> [0,1]

runs on-device with zero host data round-trips (the reference crosses
device<->host every DDIM step and patch micro-batch): three compiled
programs per geometry -- prep, DDIM chain, recombine -- with all
intermediates resident in HBM.  PSNR/SSIM are computed host-side by
wavedm_tpu.utils.metrics, reproducing the reference's three PSNR variants.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wavedm_tpu.config import Config
from wavedm_tpu.diffusion.sampling import ddim_sample, make_overlapping_sampler
from wavedm_tpu.diffusion.schedules import ddim_timesteps, get_beta_schedule
from wavedm_tpu.ops.wavelet import wavelet_dec, wavelet_rec
from wavedm_tpu.training.train_step import data_transform, inverse_data_transform
from wavedm_tpu.utils import metrics as M


class DiffusiveRestoration:
    """Restoration runner for a fixed config.

    Args:
      cfg: validated Config (wavelet or pixel path).
      unet_apply: params-bound or (variables, x, t) callable for the UNet.
      unet_params: UNet params pytree.
      hfrm_apply/hfrm_params: frozen stage-1 restorer (wavelet path only).
    """

    def __init__(self, cfg: Config, unet_apply: Callable, unet_params,
                 hfrm_apply: Optional[Callable] = None, hfrm_params=None,
                 mesh=None):
        """``mesh``: optional 1-D data mesh -- the tiled sampler's (B*K)
        patch batch is sharded over its data axis (patch-parallel
        inference/serving across chips; no reference analog, eval is
        single-GPU there -- eval_diffusion.py world_size=1)."""
        self.cfg = cfg
        self.unet_apply = unet_apply
        self.unet_params = unet_params
        self.hfrm_apply = hfrm_apply
        self.hfrm_params = hfrm_params
        self.mesh = mesh
        self.betas = jnp.asarray(get_beta_schedule(
            cfg.diffusion.beta_schedule,
            beta_start=cfg.diffusion.beta_start,
            beta_end=cfg.diffusion.beta_end,
            num_diffusion_timesteps=cfg.diffusion.num_diffusion_timesteps,
        ), dtype=jnp.float32)
        if cfg.sampling.t_start > 0:
            # truncated refinement chain over [0, t_start) -- see the
            # SamplingConfig.t_start docstring for the measured motivation
            skip = max(1, cfg.sampling.t_start
                       // cfg.sampling.sampling_timesteps)
            self.seq = np.arange(0, cfg.sampling.t_start, skip,
                                 dtype=np.int32)
        else:
            self.seq = ddim_timesteps(cfg.diffusion.num_diffusion_timesteps,
                                      cfg.sampling.sampling_timesteps)
        self._restore_fns: Dict[Tuple[int, int], Callable] = {}

    def _init_chain_state(self, base_ll, noise):
        """x_{t_start}: noise `base_ll` to the chain's starting alpha-bar.

        base_ll: the LL-band estimate chosen by ``sampling.init_ll`` (None
        for pure noise).  With t_start=0 this reproduces the reference's two
        modes exactly: begin_from_noise=True -> pure noise;
        False -> cond noised with the FULL-T alpha-bar (models/ddm.py:361-365
        uses cumprod over all betas regardless of the sampling seq)."""
        if self.cfg.sampling.t_start > 0:
            a_s = jnp.cumprod(1.0 - self.betas)[int(self.seq[-1])]
            if base_ll is None:
                return noise * jnp.sqrt(1.0 - a_s)
            return base_ll * jnp.sqrt(a_s) + noise * jnp.sqrt(1.0 - a_s)
        if self.cfg.data.begin_from_noise or base_ll is None:
            return noise
        a_T = jnp.cumprod(1.0 - self.betas)[-1]
        return base_ll * jnp.sqrt(a_T) + noise * jnp.sqrt(1.0 - a_T)

    def _init_base_ll(self, cond, hfrm):
        """Pick the init_ll source tensor (pred-channel slice) for
        ``_init_chain_state``; None = pure noise."""
        s = self.cfg.sampling
        pc = self.cfg.model.pred_channels
        if s.t_start > 0:
            if s.init_ll == "hfrm":
                if hfrm is None:
                    raise ValueError("init_ll: hfrm needs the wavelet path")
                return hfrm[..., :pc]
            if s.init_ll == "cond":
                return cond[..., :pc]
            return None
        return None if self.cfg.data.begin_from_noise else cond[..., :pc]

    def _make_sampler(self, h: int, w: int, *, use_other: bool,
                      use_fft: bool = False, use_global: bool = False):
        """Tiled sampler for (h, w) -- or, with ``sampling.whole_image``, the
        reference's non-tiled ``generalized_steps`` (utils/sampling.py:23-44)
        with reflect-padding to the UNet's 2^(levels-1) divisibility (the
        reference crashes on non-divisible whole images).  Both return
        (x_final, x0_preds) with identical calling conventions."""
        cfg = self.cfg
        if cfg.data.global_attn:
            model_fn = lambda params, x, t, g: self.unet_apply(
                {"params": params}, x, t, g)
        else:
            model_fn = lambda params, x, t: self.unet_apply(
                {"params": params}, x, t)
        if not cfg.sampling.whole_image:
            return make_overlapping_sampler(
                model_fn,
                image_shape=(h, w),
                patch_size=cfg.data.image_size,
                grid_r=cfg.sampling.grid_r,
                seq=self.seq,
                betas=self.betas,
                pred_channels=cfg.model.pred_channels,
                eta=cfg.sampling.eta,
                use_other=use_other,
                use_fft=use_fft,
                use_global=use_global,
                patch_micro_batch=cfg.sampling.patch_micro_batch,
                jit_mode=cfg.sampling.jit_mode,
                mesh=self.mesh,
                solver=cfg.sampling.solver,
                # only x0_preds[x0_pred_index] is consumed -> the scan
                # carries just that estimate (T*B*H*W floats saved)
                x0_keep=cfg.sampling.x0_pred_index,
                # the parameterization the weights were TRAINED with
                pred_type=cfg.training.pred_type,
            )
        if use_global:
            raise ValueError(
                "whole_image + global_attn is redundant (the global branch "
                "injects whole-image context into tiles); disable one")
        div = 2 ** (len(cfg.model.ch_mult) - 1)
        ph, pw = (-h) % div, (-w) % div
        eta = cfg.sampling.eta

        @jax.jit
        def whole_chain(params, x_init, x_cond, x_other, rng):
            pad = ((0, 0), (0, ph), (0, pw), (0, 0))
            x_p = jnp.pad(x_init, pad, mode="reflect")
            cond_p = jnp.pad(x_cond, pad, mode="reflect")
            if use_fft:
                from wavedm_tpu.diffusion.sampling import fft_condition
                cond_p = fft_condition(cond_p)
            oth_p = (jnp.pad(x_other, pad, mode="reflect")
                     if use_other else None)

            def fn(xx, tt):
                # ddim_sample hands us [cond | xt]; append the HF channels
                inp = (jnp.concatenate([xx, oth_p], axis=-1)
                       if oth_p is not None else xx)
                return model_fn(params, inp, tt)

            x_final, x0s = ddim_sample(fn, x_p, cond_p, self.seq,
                                       self.betas, eta=eta, rng=rng,
                                       pred_type=cfg.training.pred_type,
                                       solver=cfg.sampling.solver)
            return x_final[:, :h, :w], x0s[:, :, :h, :w]

        def sample(x_init, x_cond, x_other=None, rng=None, params=None,
                   x_global=None):
            if rng is None:
                rng = jax.random.PRNGKey(0)
            return whole_chain(params, x_init, x_cond, x_other, rng)

        return sample

    def _select_output(self, x_final, x0_preds):
        """Tiled path: the x0 estimate at ``x0_pred_index`` (reference
        models/restoration.py:108) -- the tiled sampler is built with
        ``x0_keep`` so x0_preds holds exactly that one estimate.
        Whole-image path: the final x_t (reference sample_image last=True,
        models/ddm_wavelet.py:301-303)."""
        if self.cfg.sampling.whole_image:
            return x_final
        return x0_preds[0]

    # ---------------------------------------------------------------- wavelet

    def _build_wavelet_restore(self, h: int, w: int) -> Callable:
        """Restore pipeline for pixel geometry (h, w); works in the wavelet
        domain (h/4, w/4).

        Compiled as THREE programs -- prep (HFRM + DWT + noise init), the
        25-step tiled DDIM scan, and recombine (select x0, merge HF bands,
        IWT) -- rather than one fused program: the whole chain exceeds the
        axon remote-compile relay's request-size limit when fused, and three
        dispatches per image cost only microseconds of launch overhead while
        all data stays in HBM between them.
        """
        cfg = self.cfg
        m = cfg.model
        hw, ww = h // 4, w // 4
        # params flow through as jit ARGUMENTS (closures would embed the
        # 156M-param tree as HLO constants -- oversized compile payloads)
        sampler = self._make_sampler(hw, ww, use_other=m.use_other_channels,
                                     use_global=cfg.data.global_attn)

        @jax.jit
        def prep(hfrm_params, cond_pixel, rng):
            cond_n = data_transform(cond_pixel)
            cond_w = wavelet_dec(cond_n)
            restored = self.hfrm_apply(
                {"params": hfrm_params}, cond_pixel)
            hfrm_w = wavelet_dec(data_transform(restored))
            key_init, key_s = jax.random.split(rng)
            noise = jax.random.normal(
                key_init, (cond_pixel.shape[0], hw, ww, m.pred_channels),
                jnp.float32)
            x_init = self._init_chain_state(
                self._init_base_ll(cond_w, hfrm_w), noise)
            return cond_w, hfrm_w, x_init, key_s, restored

        @jax.jit
        def recombine(x_output_ll, hfrm_w):
            full = jnp.concatenate(
                [x_output_ll[..., :m.pred_channels],
                 hfrm_w[..., m.pred_channels:]], axis=-1)
            return inverse_data_transform(wavelet_rec(full))

        def restore(cond_pixel, rng):
            cond_w, hfrm_w, x_init, key_s, restored = prep(
                self.hfrm_params, cond_pixel, rng)
            x_other = (hfrm_w[..., m.other_channels_begin:]
                       if m.use_other_channels else None)
            # use_global: the whole-image conditioning tensor IS cond_w at
            # eval -- the dataset's ``total`` is the same resized image the
            # cond channels come from (reference models/restoration.py:76,
            # datasets/raindrop.py:121-122), wavelet-decomposed into the
            # UNet's domain (see prepare_global_batch).
            x_global = cond_w if cfg.data.global_attn else None
            x_final, x0_preds = sampler(x_init, cond_w, x_other, key_s,
                                        params=self.unet_params,
                                        x_global=x_global)
            sel = self._select_output(x_final, x0_preds)
            return recombine(sel, hfrm_w), restored

        return restore

    # ----------------------------------------------------------------- pixel

    def _build_pixel_restore(self, h: int, w: int) -> Callable:
        cfg = self.cfg
        sampler = self._make_sampler(h, w, use_other=False,
                                     use_fft=cfg.data.use_fft,
                                     use_global=cfg.data.global_attn)

        @jax.jit
        def prep(cond_pixel, rng):
            cond_n = data_transform(cond_pixel)
            key_init, key_s = jax.random.split(rng)
            noise = jax.random.normal(key_init, cond_n.shape, jnp.float32)
            x_init = self._init_chain_state(
                self._init_base_ll(cond_n, None), noise)
            return cond_n, x_init, key_s

        def restore(cond_pixel, rng):
            cond_n, x_init, key_s = prep(cond_pixel, rng)
            # use_global: whole-image tensor = the full cond image
            # (reference ``total`` at eval is the same resized input,
            # models/ddm.py:380-388)
            x_global = cond_n if cfg.data.global_attn else None
            x_final, x0_preds = sampler(x_init, cond_n, None, key_s,
                                        params=self.unet_params,
                                        x_global=x_global)
            sel = self._select_output(x_final, x0_preds)
            return inverse_data_transform(sel), cond_pixel

        return restore

    # ------------------------------------------------------------------- lap

    def _build_lap_restore(self, h: int, w: int) -> Callable:
        """Laplacian-path restoration (reference restore_lap_dec /
        restore_lap_rec, models/ddm.py:329-380): decompose the 6-channel
        [cond|gt] pair with the 2-level Gauss pyramid, run the tiled DDIM
        chain on the coarse cond band at (h/4, w/4), then reconstruct with
        the ORIGINAL degraded high bands and the GROUND-TRUTH low band --
        both reference quirks reproduced faithfully: the learned translator's
        output feeds only the ``x_check`` identities (models/ddm.py:345-355),
        never the restored image, and ``x_gt_lowf`` comes from the GT
        channels at eval (models/ddm.py:332)."""
        cfg = self.cfg
        from wavedm_tpu.models.laplacian import LaplacianPyramid
        from wavedm_tpu.training.lap import LAP_NUM_HIGH
        lap = LaplacianPyramid(LAP_NUM_HIGH)
        ch, cw = h // 4, w // 4
        sampler = self._make_sampler(ch, cw, use_other=False)

        @jax.jit
        def prep(pair_pixel, rng):
            x6 = data_transform(pair_pixel)        # (1, h, w, 6) [cond|gt]
            pyr = lap.decompose(x6)
            coarse = pyr[-1]
            key_init, key_s = jax.random.split(rng)
            noise = jax.random.normal(
                key_init, (pair_pixel.shape[0], ch, cw,
                           cfg.model.pred_channels), jnp.float32)
            x_init = self._init_chain_state(
                self._init_base_ll(coarse[..., :3], None), noise)
            return pyr, coarse[..., :3], coarse[..., 3:], x_init, key_s

        @jax.jit
        def recombine(pyr_high, x_output_ll, gt_lowf):
            pyr_out = list(pyr_high) + [
                jnp.concatenate([x_output_ll, gt_lowf], axis=-1)]
            rec = lap.reconstruct(pyr_out)
            return inverse_data_transform(rec[..., :3])

        def restore(pair_pixel, rng):
            pyr, cond_coarse, gt_lowf, x_init, key_s = prep(pair_pixel, rng)
            x_final, x0_preds = sampler(x_init, cond_coarse, None, key_s,
                                        params=self.unet_params)
            sel = self._select_output(x_final, x0_preds)
            out = recombine(pyr[:-1], sel, gt_lowf)
            return out, pair_pixel[..., :3]

        return restore

    # ------------------------------------------------------------------- API

    def restore_image(self, cond_pixel: np.ndarray,
                      rng: Optional[jax.Array] = None) -> Tuple[np.ndarray, np.ndarray]:
        """(B|None, H, W, 3) [0,1] degraded image(s) -> (restored, hfrm_out).

        B > 1 restores a batch of same-geometry images in ONE fused program
        (the tiled DDIM runs a (B*K)-patch UNet batch per step), amortizing
        dispatch -- the reference is strictly one image per loop
        (models/restoration.py:63-168).

        Lap path: expects the (B|None, H, W, 6) [cond|gt] pair -- the
        reference decomposes the concatenated pair and uses the GT low band
        at eval (models/ddm.py:329-336)."""
        if cond_pixel.ndim == 3:
            cond_pixel = cond_pixel[None]
        out, aux = self.restore_image_device(cond_pixel, rng)
        # only the restored image is fetched to host; the aux tensor (HFRM
        # output / cond passthrough) stays on device -- np.asarray it if
        # needed (fetching both doubled the host-transfer cost per image)
        return np.asarray(out), aux

    def _get_restore_fn(self, h: int, w: int, nch: int) -> Callable:
        key = (h, w)
        if key not in self._restore_fns:
            if self.cfg.data.lap:
                if nch != 6:
                    raise ValueError(
                        "lap restoration needs the 6-channel [cond|gt] pair")
                self._restore_fns[key] = self._build_lap_restore(h, w)
            elif self.cfg.data.wavelet and not self.cfg.data.wavelet_in_unet:
                if self.hfrm_apply is None:
                    raise ValueError("wavelet path requires a frozen HFRM")
                self._restore_fns[key] = self._build_wavelet_restore(h, w)
            else:
                self._restore_fns[key] = self._build_pixel_restore(h, w)
        return self._restore_fns[key]

    def restore_image_device(self, cond_pixel, rng=None):
        """Same as restore_image but returns DEVICE arrays with no host
        transfer -- the timing-honest entry point for benchmarks and for
        callers composing further on-device work."""
        if cond_pixel.ndim == 3:
            cond_pixel = cond_pixel[None]
        fn = self._get_restore_fn(int(cond_pixel.shape[1]),
                                  int(cond_pixel.shape[2]),
                                  int(cond_pixel.shape[-1]))
        if rng is None:
            rng = jax.random.PRNGKey(self.cfg.training.seed)
        return fn(jnp.asarray(cond_pixel), rng)

    def restore(self, samples: Iterable[Tuple[np.ndarray, str]],
                save_dir: Optional[str] = None,
                rng: Optional[jax.Array] = None,
                eval_batch: int = 1) -> Dict[str, float]:
        """Evaluate over (pair(H,W,6), image_id) samples; returns mean metrics.

        Mirrors the reference loop (models/restoration.py:63-168): per-image
        PSNR in three variants + SSIM, optional image dumps.

        ``eval_batch`` > 1 restores that many same-geometry images per fused
        program (the eval protocol canonicalizes to one size, so batching is
        free); metrics stay per-image.  The reference is strictly 1/loop.
        """
        from wavedm_tpu.utils.images import save_image  # lazy: PIL optional

        # image dumps are coordinator-only in multi-host runs (the
        # reference's rank-0 gating, models/ddm_wavelet.py:275-283)
        if save_dir is not None and jax.process_index() != 0:
            save_dir = None
        psnr_t, psnr_y, psnr_n, ssims = [], [], [], []
        if rng is None:
            rng = jax.random.PRNGKey(self.cfg.training.seed)

        def flush(batch):
            nonlocal rng
            if not batch:
                return
            rng, sub = jax.random.split(rng)
            pairs = np.stack([p for p, _ in batch])
            inp = pairs if self.cfg.data.lap else pairs[..., :3]
            # lap restoration consumes the full pair (GT low band at eval,
            # a reference quirk -- models/ddm.py:332)
            out, _ = self.restore_image(inp, sub)
            for k, (pair, img_id) in enumerate(batch):
                cond, gt = pair[..., :3], pair[..., 3:]
                out0 = out[k]
                psnr_t.append(M.psnr_torch(gt, out0))
                psnr_y.append(M.psnr_y(gt, out0))
                psnr_n.append(M.psnr_np(
                    np.clip(gt * 255, 0, 255), np.clip(out0 * 255, 0, 255),
                    test_y_channel=True))
                ssims.append(M.ssim(
                    np.clip(gt * 255, 0, 255), np.clip(out0 * 255, 0, 255)))
                if save_dir is not None:
                    save_image(out0, f"{save_dir}/{img_id}_output.png")
                    save_image(cond, f"{save_dir}/{img_id}_cond.png")
                    save_image(gt, f"{save_dir}/{img_id}_gt.png")

        buf = []
        for pair, img_id in samples:
            if buf and pair.shape != buf[0][0].shape:
                flush(buf)  # geometry changed; don't mix shapes in a batch
                buf = []
            buf.append((pair, img_id))
            if len(buf) == max(1, eval_batch):
                flush(buf)
                buf = []
        flush(buf)
        sums = np.array([np.sum(psnr_t), np.sum(psnr_y), np.sum(psnr_n),
                         np.sum(ssims), float(len(psnr_t))], np.float64)
        if jax.process_count() > 1:
            # each process saw only its index-striped shard of the split
            # (data/raindrop.py): all-reduce metric sums + counts so every
            # process reports FULL-set means, not 1/P of the set
            from jax.experimental import multihost_utils
            sums = np.asarray(
                multihost_utils.process_allgather(jnp.asarray(sums))
            ).sum(axis=0)
        n = max(sums[4], 1.0)
        return {
            "psnr_torch": float(sums[0] / n),
            "psnr_y": float(sums[1] / n),
            "psnr_np_y": float(sums[2] / n),
            "ssim": float(sums[3] / n),
            "n_images": int(sums[4]),
        }
