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

        # Opt-in loss machinery (ALL dead in the reference -- see
        # HFRMConfig; reference scaffolding train_hfrm.py:58-141)
        self.vgg = self.vgg_params = None
        if cfg.hfrm.use_perceptual:
            from wavedm_tpu.models.vgg_loss import (VGG19Features,
                                                    convert_vgg19_features)
            self.vgg = VGG19Features()
            if cfg.hfrm.vgg_ckpt:
                import torch
                sd = torch.load(cfg.hfrm.vgg_ckpt, map_location="cpu")
                self.vgg_params = convert_vgg19_features(
                    {k: v.numpy() for k, v in sd.items()})
            else:
                self.log("hfrm.use_perceptual without vgg_ckpt: random "
                         "VGG features (hermetic env; see models/vgg_loss.py)")
                self.vgg_params = self.vgg.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
        self.disc = self.disc_state = None
        if cfg.hfrm.use_gan:
            from wavedm_tpu.models.wdnet import Discriminator
            self.disc = Discriminator()
            dkey = jax.random.PRNGKey(cfg.training.seed + 1)
            z = jnp.zeros((1, 64, 64, 3))
            dparams = self.disc.init(dkey, z, z)["params"]
            self.disc_tx = optax.adam(cfg.hfrm.lr, b1=0.5, b2=0.999)
            self.disc_state = TrainState(
                params=dparams, opt_state=self.disc_tx.init(dparams),
                ema={}, step=jnp.zeros((), jnp.int32), rng=dkey)
        self._step = self._build_step()

    def _build_step(self):
        model = self.model
        tx = self.tx
        cfg = self.cfg
        vgg, vgg_params = self.vgg, self.vgg_params
        disc = self.disc
        disc_tx = getattr(self, "disc_tx", None)

        def loss_fn(params, cond, gt, disc_params=None):
            fake = model.apply({"params": params}, cond)
            # 2 * L1 on [0,255] data (train_hfrm.py:259-267)
            loss = 2.0 * jnp.mean(jnp.abs(fake * 255.0 - gt * 255.0))
            if vgg is not None:
                from wavedm_tpu.models.vgg_loss import perceptual_loss
                loss = loss + perceptual_loss(
                    vgg.apply({"params": vgg_params}, fake * 255.0),
                    vgg.apply({"params": vgg_params}, gt * 255.0))
            if cfg.hfrm.tv_weight > 0.0:
                loss = loss + tv_loss(fake, cfg.hfrm.tv_weight)
            if disc_params is not None:
                # lsgan generator term: D(cond, fake) -> 1 under MSE
                # (criterion_GAN = MSELoss, train_hfrm.py:131)
                d_fake = disc.apply({"params": disc_params}, cond, fake)
                loss = loss + cfg.hfrm.lambda_gan * jnp.mean(
                    jnp.square(d_fake - 1.0))
            # per-image PSNR (BatchPSNR, train_hfrm.py:27-31)
            diff = jnp.clip(fake, 0, 1) - jnp.clip(gt, 0, 1)
            rmse = jnp.sqrt(jnp.mean(diff ** 2, axis=(1, 2, 3)))
            psnr = 20.0 * jnp.log10(1.0 / rmse)
            return loss, (psnr, fake)

        def step_fn(state: TrainState, batch):
            cond, gt = batch[..., :3], batch[..., 3:]
            (loss, (psnr, _)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, cond, gt)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=params, opt_state=opt_state, ema=state.ema,
                step=state.step + 1, rng=state.rng)
            return new_state, (loss, jnp.mean(psnr))

        def gan_step_fn(state: TrainState, disc_state: TrainState, batch):
            cond, gt = batch[..., :3], batch[..., 3:]
            (loss, (psnr, fake)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, cond, gt,
                                       disc_state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=params, opt_state=opt_state, ema=state.ema,
                step=state.step + 1, rng=state.rng)

            def d_loss_fn(dp):
                d_real = disc.apply({"params": dp}, cond, gt)
                d_fake = disc.apply({"params": dp}, cond,
                                    jax.lax.stop_gradient(fake))
                return 0.5 * (jnp.mean(jnp.square(d_real - 1.0))
                              + jnp.mean(jnp.square(d_fake)))

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(disc_state.params)
            d_updates, d_opt = disc_tx.update(d_grads, disc_state.opt_state,
                                              disc_state.params)
            d_params = optax.apply_updates(disc_state.params, d_updates)
            new_disc = TrainState(
                params=d_params, opt_state=d_opt, ema=disc_state.ema,
                step=disc_state.step + 1, rng=disc_state.rng)
            return new_state, new_disc, (loss, jnp.mean(psnr), d_loss)

        if disc is not None:
            if self.mesh is None or self.mesh.size == 1:
                return jax.jit(gan_step_fn, donate_argnums=(0, 1))
            from jax.sharding import NamedSharding, PartitionSpec as P
            from wavedm_tpu.parallel.mesh import DATA_AXIS
            return jax.jit(
                gan_step_fn,
                in_shardings=(None, None,
                              NamedSharding(self.mesh, P(DATA_AXIS))),
                donate_argnums=(0, 1))

        if self.mesh is None or self.mesh.size == 1:
            return jax.jit(step_fn, donate_argnums=(0,))
        from jax.sharding import NamedSharding, PartitionSpec as P
        from wavedm_tpu.parallel.mesh import DATA_AXIS
        return jax.jit(step_fn,
                       in_shardings=(None, NamedSharding(self.mesh, P(DATA_AXIS))),
                       donate_argnums=(0,))

    def save(self, ckpt_dir: str, name: str) -> None:
        extra_arrays = ({"disc": self.disc_state}
                        if self.disc_state is not None else None)
        save_checkpoint(os.path.join(ckpt_dir, name), self.state,
                        epoch=self.epoch,
                        extra={"best_psnr": np.float64(self.best_psnr)},
                        extra_arrays=extra_arrays)

    def resume(self, path: str) -> None:
        if self.disc_state is not None:
            self.state, meta, extras = load_checkpoint(
                path, self.state, extras_template={"disc": self.disc_state})
            if "disc" in extras:
                self.disc_state = extras["disc"]
        else:
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
                if self.disc_state is not None:
                    self.state, self.disc_state, (loss, psnr, d_loss) = \
                        self._step(self.state, self.disc_state, batch)
                else:
                    self.state, (loss, psnr) = self._step(self.state, batch)
                step = int(self.state.step)
                epoch_psnr.append(float(psnr))
                timer.stop(sync_on=psnr)
                if step % 100 == 0:
                    d_note = (f" D loss: {float(d_loss):.4f}"
                              if self.disc_state is not None else "")
                    self.log(f"[Epoch {epoch}] step {step} "
                             f"G loss: {float(loss):.4f} PSNR: {float(psnr):.3f} "
                             f"step time: {timer.mean:.3f}s" + d_note)
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
                # 'lastest' (reference spelling) every 5th epoch: on
                # short-epoch datasets the reference's every-epoch cadence
                # (train_hfrm.py:300-307) turns into a checkpoint write
                # every ~40 s of step time
                if epoch % 5 == 4 or epoch == cfg.hfrm.n_epochs - 1:
                    self.save(ckpt_dir, "lastest")
