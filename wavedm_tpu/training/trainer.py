"""Diffusion trainer: the epoch/step loop around the jitted train step.

Replaces the reference trainer loop (``DenoisingDiffusion_Wavelet.train``,
models/ddm_wavelet.py:200-292): per-step wavelet prep + loss + backward + EMA
all live inside the compiled step; the Python loop only feeds batches,
logs, checkpoints (snapshot_freq), and runs in-train validation
(validation_freq, process-0 only).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wavedm_tpu.config import Config
from wavedm_tpu.models.hfrm import HFRM
from wavedm_tpu.models.unet import DiffusionUNet
from wavedm_tpu.parallel.mesh import make_mesh, shard_batch
from wavedm_tpu.training.state import TrainState, create_train_state
from wavedm_tpu.training.train_step import make_train_step
from wavedm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from wavedm_tpu.utils.profiling import MetricsLogger, StepTimer


@dataclass
class TrainLogEntry:
    step: int
    loss: float
    loss_per_pixel: float
    mse_per_pixel: float
    data_time: float
    step_time: float


class DiffusionTrainer:
    """Owns model/state/step; the dataset supplies host batches."""

    def __init__(self, cfg: Config, use_mesh: bool = True,
                 hfrm_params=None, log_fn: Callable[[str], None] = print):
        self.cfg = cfg
        self.log = log_fn
        if cfg.data.global_attn:
            # reference builds DiffusionUNet_Global behind the same flag
            # (models/ddm.py:140-143)
            from wavedm_tpu.models.unet_global import DiffusionUNetGlobal
            self.model = DiffusionUNetGlobal.from_config(cfg)
        else:
            self.model = DiffusionUNet.from_config(cfg)
        self.mesh = make_mesh(cfg.parallel.data_axis) if use_mesh else None

        key = jax.random.PRNGKey(cfg.training.seed)
        key, init_key = jax.random.split(key)
        sample_shape = (1, cfg.data.image_size, cfg.data.image_size,
                        cfg.model.unet_in_channels)
        init_args = [jnp.zeros(sample_shape), jnp.zeros((1,))]
        if cfg.data.global_attn:
            # any spatial size that survives the stride-2 global chain works
            # for param shapes; 8 * 2^(levels-1) is the minimum
            gs = 8 * 2 ** (len(cfg.model.ch_mult) - 1)
            gc = (cfg.model.in_channels
                  if cfg.data.wavelet and not cfg.data.wavelet_in_unet
                  else cfg.data.channels)
            init_args.append(jnp.zeros((1, gs, gs, gc)))
        params = jax.jit(self.model.init)(init_key, *init_args)["params"]
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(params))
        self.log(f"Total_params_model_real: {n_params / 1e6}M")
        self.state = create_train_state(params, cfg.optim, key)
        self.epoch = 0

        self.lap_state = None
        if cfg.data.lap:
            # co-trained high-frequency translator with its own Adam +
            # per-epoch cosine LR (reference models/ddm.py:131-138)
            from wavedm_tpu.training.lap import create_lap_state
            key, lap_key = jax.random.split(key)
            _, self.lap_state = create_lap_state(lap_key, cfg.data.patch_size)

        hfrm_fn = None
        needs_hfrm = (cfg.data.wavelet and cfg.model.use_other_channels
                      and not cfg.model.use_gt_in_train)
        if needs_hfrm:
            if hfrm_params is None:
                raise ValueError(
                    "use_gt_in_train=False requires frozen HFRM params "
                    "(cfg.hfrm.ckpt_path or hfrm_params=)")
            hfrm = HFRM.from_config(cfg)
            frozen = hfrm_params
            hfrm_fn = lambda x: hfrm.apply({"params": frozen}, x)
        self.hfrm_fn = hfrm_fn

        self.train_step = make_train_step(
            cfg, self.model.apply, mesh=self.mesh, hfrm_fn=hfrm_fn,
            donate=True)

    # ------------------------------------------------------------------ ckpt

    def save(self, path: str) -> None:
        # unlike the reference, the lap translator IS checkpointed: the
        # reference saves no 'lap_state_dict' (commented out,
        # models/ddm.py:273) yet load_ddm_ckpt reads it (models/ddm.py:178)
        # -- resuming a lap run there crashes with KeyError
        extra_arrays = ({"lap": self.lap_state}
                        if self.lap_state is not None else None)
        save_checkpoint(path, self.state, epoch=self.epoch,
                        extra_arrays=extra_arrays)

    def resume(self, path: str) -> None:
        if self.lap_state is not None:
            self.state, meta, extras = load_checkpoint(
                path, self.state, extras_template={"lap": self.lap_state})
            if "lap" in extras:
                self.lap_state = extras["lap"]
        else:
            self.state, meta = load_checkpoint(path, self.state)
        self.epoch = int(meta.get("epoch", 0))
        self.log(f"=> loaded checkpoint '{path}' "
                 f"(epoch {self.epoch}, step {int(self.state.step)})")

    # ------------------------------------------------------------------ train

    def fit(self, batch_iter_fn: Callable[[int], Iterable[np.ndarray]],
            max_steps: Optional[int] = None,
            ckpt_dir: Optional[str] = None,
            validate_fn: Optional[Callable[[TrainState, int], None]] = None,
            metrics_path: Optional[str] = None):
        """Run epochs until ``training.n_epochs``, ``training.n_iters`` global
        steps, or ``max_steps``.

        batch_iter_fn(epoch) -> iterable of (B, P, P, 6) float32 batches.
        validate_fn(state, step): optional in-train eval hook
        (reference models/ddm_wavelet.py:275-280).
        metrics_path: optional JSONL file receiving per-log-step metrics
        (process-0 only).
        """
        cfg = self.cfg
        history = []
        stop_at = (min(max_steps, cfg.training.n_iters)
                   if max_steps is not None else cfg.training.n_iters)
        timer = StepTimer()
        mlog = MetricsLogger(metrics_path) if metrics_path else None
        for epoch in range(self.epoch, cfg.training.n_epochs):
            self.epoch = epoch
            data_start = time.time()
            for batch in batch_iter_fn(epoch):
                data_time = time.time() - data_start
                if self.mesh is not None:
                    batch = shard_batch(
                        jax.tree_util.tree_map(jnp.asarray, batch), self.mesh)
                timer.start()
                if self.lap_state is not None:
                    from wavedm_tpu.training.lap import lap_lr_for_epoch
                    lap_lr = lap_lr_for_epoch(epoch, cfg.training.n_epochs)
                    self.state, self.lap_state, m = self.train_step(
                        self.state, self.lap_state, batch, lap_lr)
                else:
                    self.state, m = self.train_step(self.state, batch)
                step = int(self.state.step)
                if step % 10 == 0:
                    timer.stop(sync_on=m.loss)
                    entry = TrainLogEntry(
                        step=step, loss=float(m.loss),
                        loss_per_pixel=float(m.loss_per_pixel),
                        mse_per_pixel=float(m.mse_loss) /
                        (cfg.model.pred_channels * cfg.data.image_size ** 2),
                        data_time=data_time, step_time=timer.times[-1])
                    history.append(entry)
                    lap_note = (f", loss_trans: {float(m.loss_trans):.5f}"
                                if self.lap_state is not None else "")
                    self.log(
                        f"step: {entry.step}, loss: {entry.loss:.2f}, "
                        f"loss/px: {entry.loss_per_pixel:.5f}, "
                        f"mse/px: {entry.mse_per_pixel:.5f}, "
                        f"step time: {entry.step_time:.3f}s "
                        f"(avg {timer.mean:.3f}s), "
                        f"data time: {entry.data_time:.3f}s" + lap_note)
                    if mlog is not None:
                        mlog.log(step, loss=entry.loss,
                                 loss_per_pixel=entry.loss_per_pixel,
                                 mse_per_pixel=entry.mse_per_pixel,
                                 step_time=entry.step_time,
                                 data_time=entry.data_time)
                if (validate_fn is not None
                        and step % cfg.training.validation_freq == 0
                        and jax.process_index() == 0):
                    validate_fn(self.state, step)
                if ckpt_dir and (step % cfg.training.snapshot_freq == 0
                                 or step == 1):
                    self.save(os.path.join(
                        ckpt_dir,
                        f"{cfg.data.dataset}_epoch{epoch + 1}_ddpm"))
                    if cfg.training.keep_snapshots:
                        from wavedm_tpu.utils.checkpoint import (
                            prune_checkpoints)
                        prune_checkpoints(ckpt_dir,
                                          cfg.training.keep_snapshots)
                if step >= stop_at:
                    return history
                data_start = time.time()
        return history
