"""The jitted diffusion train step.

One pure function per step: batch prep (domain transform) -> antithetic t /
noise draw -> eps-loss -> grad -> Adam -> EMA, compiled once and sharded over
the data axis of a `Mesh`.  Replaces the reference's per-step Python loop body
(models/ddm_wavelet.py:210-273) where wavelet dec, HFRM forward, loss,
backward, DDP allreduce, and EMA ran as separate CUDA launches.

Domain transforms (the ddm/ddm_wavelet duplication in the reference collapses
into this parameterisation):
  pixel    -- identity (reference models/ddm.py path)
  wavelet  -- 2-level Haar packet on cond and target
              (reference models/ddm_wavelet.py:192-198, 227-250)
  lap      -- 2-level Gauss pyramid; diffusion on the coarsest level while a
              learned high-frequency translator co-trains with its own Adam
              (reference models/ddm.py:131-138, 195-204, 230-232)
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wavedm_tpu.config import Config
from wavedm_tpu.diffusion.ema import ema_update
from wavedm_tpu.diffusion.loss import antithetic_timesteps, noise_estimation_loss
from wavedm_tpu.diffusion.schedules import get_beta_schedule
from wavedm_tpu.ops.wavelet import wavelet_dec
from wavedm_tpu.parallel.mesh import DATA_AXIS
from wavedm_tpu.training.state import TrainState, make_optimizer


def data_transform(x: jax.Array) -> jax.Array:
    """[0,1] -> [-1,1] (reference models/ddm_wavelet.py:28-29)."""
    return 2.0 * x - 1.0


def inverse_data_transform(x: jax.Array) -> jax.Array:
    """[-1,1] -> [0,1] clamped (reference models/ddm_wavelet.py:32-33)."""
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)


def prepare_pixel_batch(x: jax.Array, cfg: Config) -> jax.Array:
    """(B, P, P, 6) [cond|gt] in [0,1] -> training tensor [cond | target];
    with ``data.use_fft`` the conditioning is tripled to
    [cond | FFT amp | FFT phase] (reference models/ddm.py:241)."""
    x = data_transform(x)
    if cfg.data.use_fft:
        from wavedm_tpu.diffusion.sampling import fft_condition
        c = cfg.data.channels
        return jnp.concatenate([fft_condition(x[..., :c]), x[..., c:]], axis=-1)
    return x


def prepare_wavelet_batch(
    x: jax.Array,
    cfg: Config,
    hfrm_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> jax.Array:
    """(B, P, P, 6) pixel crops -> (B, P/4, P/4, 96) wavelet training tensor
    [cond(48) | gt-LL(pred) | HF(45)].

    With ``use_gt_in_train`` the HF conditioning channels come from the
    ground-truth wavelet coefficients (reference models/ddm_wavelet.py:239-243);
    otherwise from the frozen HFRM restorer output
    (models/ddm_wavelet.py:233-236, 245-246) -- pass ``hfrm_fn`` for that path.
    """
    m = cfg.model
    x_all = data_transform(x)
    cond_w = wavelet_dec(x_all[..., :3])
    gt_w = wavelet_dec(x_all[..., 3:6])
    if not m.use_other_channels:
        return jnp.concatenate([cond_w, gt_w[..., :m.pred_channels]], axis=-1)
    if m.use_gt_in_train:
        hf = gt_w[..., m.other_channels_begin:]
    else:
        if hfrm_fn is None:
            raise ValueError("use_gt_in_train=False requires an hfrm_fn")
        restored = hfrm_fn(x[..., :3])  # HFRM runs on [0,1] pixels
        hf = wavelet_dec(data_transform(restored))[..., m.other_channels_begin:]
    return jnp.concatenate(
        [cond_w, gt_w[..., :m.pred_channels], hf], axis=-1)


def prepare_global_batch(total: jax.Array, cfg: Config) -> jax.Array:
    """Whole-image conditioning for the global-attention UNet
    (``data.global_attn``).

    Pixel path: ``data_transform(total)`` (reference models/ddm.py:226-229).
    Wavelet path: additionally wavelet-decomposed into the UNet's working
    domain -- the reference passes the raw 3-channel pixel tensor, which
    CRASHES in ``global_conv_in`` (a ``model.in_channels``-wide conv,
    models/unet.py:499, vs 3 input channels); decomposing to 48 channels is
    the documented deviation that makes the flag actually usable
    (see models/unet_global.py module docstring).
    """
    t = data_transform(total)
    if cfg.data.wavelet and not cfg.data.wavelet_in_unet:
        t = wavelet_dec(t)
    return t


class StepMetrics(NamedTuple):
    loss: jax.Array          # eps loss (sum-pixels, mean-batch)
    mse_loss: jax.Array      # x0 MSE
    loss_per_pixel: jax.Array
    grad_norm: jax.Array
    loss_trans: jax.Array = 0.0  # lap translator MSE (lap path only)


def make_train_step(
    cfg: Config,
    model_apply: Callable,
    mesh: Optional[Mesh] = None,
    hfrm_fn: Optional[Callable] = None,
    donate: bool = True,
):
    """Build the jitted train step: (TrainState, batch) -> (TrainState, StepMetrics).

    batch: (B, P, P, 6) float32 in [0,1], leading axis sharded over the data
    mesh axis when ``mesh`` is given.
    """
    m = cfg.model
    betas = jnp.asarray(get_beta_schedule(
        cfg.diffusion.beta_schedule,
        beta_start=cfg.diffusion.beta_start,
        beta_end=cfg.diffusion.beta_end,
        num_diffusion_timesteps=cfg.diffusion.num_diffusion_timesteps,
    ), dtype=jnp.float32)
    num_timesteps = cfg.diffusion.num_diffusion_timesteps
    tx = make_optimizer(cfg.optim)
    mu = cfg.model.ema_rate
    num_of_pixel = m.pred_channels * cfg.data.image_size ** 2
    if cfg.data.wavelet:
        inp_channels = m.in_channels
    else:
        inp_channels = cfg.data.channels * (3 if cfg.data.use_fft else 1)

    use_global = cfg.data.global_attn

    def prepare(x):
        if cfg.data.wavelet and not cfg.data.wavelet_in_unet:
            return prepare_wavelet_batch(x, cfg, hfrm_fn)
        return prepare_pixel_batch(x, cfg)

    def loss_fn(params, x_for_pred, t, e, x_global):
        if x_global is None:
            fn = lambda xx, tt: model_apply({"params": params}, xx, tt)
        else:
            # global-attention UNet: whole-image tensor as the third input
            # (reference noise_estimation_loss, models/ddm_wavelet.py:119);
            # batch broadcast (one total per image vs patch_n crops) happens
            # inside AttnGlobal.
            fn = lambda xx, tt: model_apply(
                {"params": params}, xx, tt, x_global)
        out = noise_estimation_loss(
            fn, x_for_pred, t, e, betas,
            inp_channels=inp_channels,
            pred_channels=m.pred_channels,
            use_other_channels=m.use_other_channels,
            pred_type=cfg.training.pred_type,
            snr_gamma=cfg.training.snr_gamma,
        )
        main = out.mse_loss if cfg.training.use_mse else out.simple_loss
        return main, out

    accum = max(1, cfg.training.grad_accum)
    if accum > 1 and (cfg.data.global_attn or cfg.data.lap):
        raise ValueError("training.grad_accum > 1 is not supported with "
                         "global_attn or the lap path")

    def diffusion_update(state: TrainState, x_for_pred, x_global,
                         loss_trans=0.0):
        """The shared diffusion half of a step: t/e draws, eps-loss grads,
        optimizer, EMA.

        ``training.grad_accum`` > 1 splits the crop batch into that many
        micro-batches inside ONE compiled step (a ``lax.scan`` over grad
        evaluations -> averaged update): big effective batches at ~1/A the
        activation HBM.  The reference has no equivalent (its effective
        batch is fixed by GPU count, train_diffusion.py DDP).
        """
        rng, key_t, key_e = jax.random.split(state.rng, 3)
        n = x_for_pred.shape[0]
        t = antithetic_timesteps(key_t, n, num_timesteps)
        e = jax.random.normal(
            key_e, x_for_pred.shape[:3] + (m.pred_channels,), jnp.float32)

        if accum == 1:
            (main, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, x_for_pred, t, e, x_global)
            simple_loss, mse_loss = out.simple_loss, out.mse_loss
        else:
            if n % accum:
                raise ValueError(
                    f"batch of {n} crops not divisible by grad_accum={accum}")
            mb = n // accum
            xs = x_for_pred.reshape((accum, mb) + x_for_pred.shape[1:])
            ts = t.reshape(accum, mb)
            es = e.reshape((accum, mb) + e.shape[1:])
            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)

            def body(carry, xte):
                g_acc, s_acc, m_acc = carry
                (_, out_i), g_i = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, *xte, None)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g_i)
                return (g_acc, s_acc + out_i.simple_loss,
                        m_acc + out_i.mse_loss), None

            (grads, s_sum, m_sum), _ = jax.lax.scan(
                body, (zero, 0.0, 0.0), (xs, ts, es))
            # micro losses are batch MEANS over equal micro-batches, so the
            # full-batch mean is their average; same for the gradient
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            simple_loss, mse_loss = s_sum / accum, m_sum / accum

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        ema = ema_update(state.ema, params, mu)

        new_state = TrainState(
            params=params, opt_state=opt_state, ema=ema,
            step=state.step + 1, rng=rng)
        metrics = StepMetrics(
            loss=simple_loss,
            mse_loss=mse_loss,
            loss_per_pixel=simple_loss / num_of_pixel,
            grad_norm=jnp.sqrt(sum(jnp.sum(jnp.square(g))
                                   for g in jax.tree_util.tree_leaves(grads))),
            loss_trans=loss_trans,
        )
        return new_state, metrics

    if cfg.data.lap:
        # Lap domain: diffusion on the coarsest pyramid level; the learned
        # high-frequency translator takes its own Adam step on per-level MSEs
        # in the same compiled program (reference models/ddm.py:195-204,
        # 230-232; LR is the per-epoch cosine value passed by the trainer).
        from wavedm_tpu.models.laplacian import LaplacianPyramid
        from wavedm_tpu.training.lap import (
            LAP_NUM_HIGH, LapState, make_lap_model, make_lap_optimizer)
        lap_pyr_op = LaplacianPyramid(LAP_NUM_HIGH)
        lap_model = make_lap_model()
        lap_tx = make_lap_optimizer()

        def lap_step_fn(state: TrainState, lap_state, batch, lap_lr):
            x = data_transform(batch)  # (B, P, P, 6) [cond|gt]
            pyr = lap_pyr_op.decompose(x)

            def lap_loss_fn(lp):
                trans = lap_model.apply(
                    {"params": lp}, [lvl[..., :3] for lvl in pyr])
                return sum(jnp.mean(jnp.square(trans[l] - pyr[l][..., 3:]))
                           for l in range(LAP_NUM_HIGH))

            loss_trans, lap_grads = jax.value_and_grad(lap_loss_fn)(
                lap_state.params)
            lap_updates, lap_opt = lap_tx.update(
                lap_grads, lap_state.opt_state, lap_state.params)
            lap_params = jax.tree_util.tree_map(
                lambda p, u: p - lap_lr * u, lap_state.params, lap_updates)
            new_lap = LapState(params=lap_params, opt_state=lap_opt)

            new_state, metrics = diffusion_update(
                state, pyr[-1], None, loss_trans)
            return new_state, new_lap, metrics

        if mesh is None or mesh.size == 1:
            return jax.jit(lap_step_fn,
                           donate_argnums=(0, 1) if donate else ())
        data_sh = NamedSharding(mesh, P(DATA_AXIS))
        return jax.jit(
            lap_step_fn,
            in_shardings=(None, None, data_sh, None),
            donate_argnums=(0, 1) if donate else (),
        )

    def step_fn(state: TrainState, batch):
        if use_global:
            batch, total = batch
            x_global = prepare_global_batch(total, cfg)
        else:
            x_global = None
        return diffusion_update(state, prepare(batch), x_global)

    if mesh is None or mesh.size == 1:
        # A 1-device mesh gains nothing from explicit shardings (and the
        # axon TPU relay mishandles them); plain jit is identical there.
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    # Batch is sharded over the data axis; the state keeps whatever sharding
    # it was created with (replicated, or FSDP via fsdp_param_shardings), and
    # XLA inserts the grad-allreduce / param-allgather collectives.
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    batch_sh = (data_sh, data_sh) if use_global else data_sh
    return jax.jit(
        step_fn,
        in_shardings=(None, batch_sh),
        donate_argnums=(0,) if donate else (),
    )
