"""Stage-1 HFRM trainer.

Reference semantics (train_hfrm.py:229-307): Adam(lr 2e-4, betas (0.5, 0.999)),
continuous LR decay lr * (1/2)**(step/100000), loss = 2 * L1(fake*255, real*255)
(the only active loss term; VGG/TV/GAN scaffolding in the reference is dead
code), per-step batch PSNR, per-epoch best-checkpoint gate starting at 31 dB.

TPU-native: one jitted step (forward, loss, grad, Adam with inject_hyperparams
for the decaying LR, PSNR) over the data-parallel mesh.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wavedm_tpu.config import Config
from wavedm_tpu.models.hfrm import HFRM
from wavedm_tpu.parallel.mesh import make_mesh, shard_batch
from wavedm_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from wavedm_tpu.training.state import TrainState


def tv_loss(x: jax.Array, weight: float = 1.0) -> jax.Array:
    """Total-variation regulariser (reference TVLoss, train_hfrm.py:86-103 --
    defined there but unused in the shipped loss; provided for parity and as
    an opt-in regulariser).  x: (B, H, W, C)."""
    b, h, w, c = x.shape
    h_tv = jnp.sum(jnp.square(x[:, 1:] - x[:, :-1]))
    w_tv = jnp.sum(jnp.square(x[:, :, 1:] - x[:, :, :-1]))
    count_h = (h - 1) * w * c
    count_w = h * (w - 1) * c
    return weight * 2.0 * (h_tv / count_h + w_tv / count_w) / b


def hfrm_lr_schedule(base_lr: float):
    """lr * 0.5**(step / 100000) (reference train_hfrm.py:236)."""
    def schedule(step):
        return base_lr * jnp.power(0.5, step / 100000.0)
    return schedule


class HFRMTrainer:
    def __init__(self, cfg: Config, use_mesh: bool = True,
                 log_fn: Callable[[str], None] = print):
        self.cfg = cfg
        self.log = log_fn
        self.model = HFRM.from_config(cfg)
        self.mesh = make_mesh(cfg.parallel.data_axis) if use_mesh else None

        key = jax.random.PRNGKey(cfg.training.seed)
        params = jax.jit(self.model.init)(
            key, jnp.zeros((1, 64, 64, 3)))["params"]
        # identity-center conv init, as the reference applies at stage-1
        # startup (train_hfrm.py:170 -> weights_init_normal)
        from wavedm_tpu.models.wdnet import apply_identity_center_init
        params = apply_identity_center_init(params)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(params))
        self.log(f"Total_params_model: {n_params / 1e6}M")

        self.tx = optax.adam(hfrm_lr_schedule(cfg.hfrm.lr), b1=0.5, b2=0.999)
        self.state = TrainState(
            params=params, opt_state=self.tx.init(params),
            ema={},  # HFRM keeps no EMA (an alias of params would double-donate)
            step=jnp.zeros((), jnp.int32), rng=key)
        self.best_psnr = cfg.hfrm.best_psnr_init
        self.epoch = 0
        self._step = self._build_step()

    def _build_step(self):
        model = self.model
        tx = self.tx

        def loss_fn(params, cond, gt):
            fake = model.apply({"params": params}, cond)
            # 2 * L1 on [0,255] data (train_hfrm.py:259-267)
            loss = 2.0 * jnp.mean(jnp.abs(fake * 255.0 - gt * 255.0))
            # per-image PSNR (BatchPSNR, train_hfrm.py:27-31)
            diff = jnp.clip(fake, 0, 1) - jnp.clip(gt, 0, 1)
            rmse = jnp.sqrt(jnp.mean(diff ** 2, axis=(1, 2, 3)))
            psnr = 20.0 * jnp.log10(1.0 / rmse)
            return loss, psnr

        def step_fn(state: TrainState, batch):
            cond, gt = batch[..., :3], batch[..., 3:]
            (loss, psnr), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, cond, gt)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=params, opt_state=opt_state, ema=state.ema,
                step=state.step + 1, rng=state.rng)
            return new_state, (loss, jnp.mean(psnr))

        if self.mesh is None or self.mesh.size == 1:
            return jax.jit(step_fn, donate_argnums=(0,))
        from jax.sharding import NamedSharding, PartitionSpec as P
        from wavedm_tpu.parallel.mesh import DATA_AXIS
        return jax.jit(step_fn,
                       in_shardings=(None, NamedSharding(self.mesh, P(DATA_AXIS))),
                       donate_argnums=(0,))

    def save(self, ckpt_dir: str, name: str) -> None:
        save_checkpoint(os.path.join(ckpt_dir, name), self.state,
                        epoch=self.epoch,
                        extra={"best_psnr": np.float64(self.best_psnr)})

    def resume(self, path: str) -> None:
        self.state, meta = load_checkpoint(path, self.state)
        self.epoch = int(meta.get("epoch", 0))
        self.best_psnr = float(meta.get("best_psnr", self.cfg.hfrm.best_psnr_init))

    def fit(self, batch_iter_fn: Callable[[int], Iterable[np.ndarray]],
            max_steps: Optional[int] = None,
            ckpt_dir: Optional[str] = None,
            metrics_path: Optional[str] = None):
        """batch_iter_fn(epoch) -> (B, H, W, 6) [cond|gt] batches in [0,1].

        Per-epoch: save 'lastest' always, 'best' when epoch-mean train PSNR
        beats the running best (train_hfrm.py:300-307 -- including the
        reference's 'lastest' spelling for drop-in path compatibility).
        """
        from wavedm_tpu.utils.profiling import MetricsLogger, StepTimer
        cfg = self.cfg
        timer = StepTimer()
        mlog = MetricsLogger(metrics_path) if metrics_path else None
        for epoch in range(self.epoch, cfg.hfrm.n_epochs):
            self.epoch = epoch
            epoch_psnr = []
            for batch in batch_iter_fn(epoch):
                if self.mesh is not None:
                    batch = shard_batch(jnp.asarray(batch), self.mesh)
                timer.start()
                self.state, (loss, psnr) = self._step(self.state, batch)
                step = int(self.state.step)
                epoch_psnr.append(float(psnr))
                timer.stop(sync_on=psnr)
                if step % 100 == 0:
                    self.log(f"[Epoch {epoch}] step {step} "
                             f"G loss: {float(loss):.4f} PSNR: {float(psnr):.3f} "
                             f"step time: {timer.mean:.3f}s")
                    if mlog is not None:
                        mlog.log(step, loss=float(loss), psnr=float(psnr),
                                 step_time=timer.mean)
                if max_steps is not None and step >= max_steps:
                    if ckpt_dir:
                        self.save(ckpt_dir, "lastest")
                    return
            mean_psnr = float(np.mean(epoch_psnr)) if epoch_psnr else 0.0
            self.log(f"epoch PSNR: {mean_psnr:.4f}, best psnr: {self.best_psnr:.4f}")
            if ckpt_dir:
                if mean_psnr > self.best_psnr:
                    self.best_psnr = mean_psnr
                    self.save(ckpt_dir, "best")
                self.save(ckpt_dir, "lastest")
