"""Train state: parameters, optimizer state, EMA shadow, step counter.

One flat pytree dataclass replaces the reference god-object
(``DenoisingDiffusion_Wavelet`` holding model+EMA+optimizer+samplers,
models/ddm_wavelet.py:128-178).  The optimizer factory mirrors the
reference's (utils/optimize.py:5-12: Adam(0.9, 0.999, eps, wd, amsgrad) /
RMSProp / SGD(momentum 0.9)).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from wavedm_tpu.config import OptimConfig
from wavedm_tpu.diffusion.ema import ema_init


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema: Any
    step: jax.Array          # int32 scalar
    rng: jax.Array           # PRNG key threaded through steps


def _scale_by_amsgrad_torch(b1: float, b2: float,
                            eps: float) -> optax.GradientTransformation:
    """torch.optim.Adam(amsgrad=True) scaling, exactly:
    nu_max = max(nu_max, nu) on the RAW second moment, then
    update = mu_hat / (sqrt(nu_max)/sqrt(1-b2^t) + eps)."""

    def init_fn(params):
        z = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"count": jnp.zeros((), jnp.int32),
                "mu": z(), "nu": z(), "nu_max": z()}

    def update_fn(updates, state, params=None):
        del params
        count = state["count"] + 1
        t = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state["mu"], updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state["nu"], updates)
        nu_max = jax.tree_util.tree_map(jnp.maximum, state["nu_max"], nu)
        out = jax.tree_util.tree_map(
            lambda m, vm: (m / bc1) / (jnp.sqrt(vm) / jnp.sqrt(bc2) + eps),
            mu, nu_max)
        return out, {"count": count, "mu": mu, "nu": nu, "nu_max": nu_max}

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(optim: OptimConfig) -> optax.GradientTransformation:
    """Reference-exact optimizer semantics (utils/optimize.py:5-14).

    torch applies ``weight_decay`` as *coupled* L2 (wd*p added to the gradient
    BEFORE the adaptive scaling) for both Adam and RMSProp, and ``amsgrad``
    composes with weight_decay rather than replacing it -- reproduced here
    with ``add_decayed_weights`` ahead of the adaptive transform (decoupled
    AdamW decay would be a different optimizer).
    """
    wd = [optax.add_decayed_weights(optim.weight_decay)] \
        if optim.weight_decay else []
    if optim.optimizer == "Adam":
        # optax.scale_by_amsgrad maxes the bias-CORRECTED second moment;
        # torch maxes the raw one and divides by sqrt(1-b2^t) afterwards --
        # different trajectories, so amsgrad gets a torch-exact transform.
        scale = (_scale_by_amsgrad_torch if optim.amsgrad
                 else optax.scale_by_adam)(
            b1=optim.beta1, b2=optim.beta2, eps=optim.eps)
        return optax.chain(*wd, scale,
                           optax.scale_by_learning_rate(optim.lr))
    if optim.optimizer == "RMSProp":
        # torch RMSprop defaults: alpha=0.99, eps=1e-8, momentum=0
        return optax.chain(*wd, optax.scale_by_rms(decay=0.99, eps=1e-8),
                           optax.scale_by_learning_rate(optim.lr))
    if optim.optimizer == "SGD":
        # reference SGD passes no weight_decay (utils/optimize.py:12)
        return optax.sgd(learning_rate=optim.lr, momentum=0.9)
    raise ValueError(f"unknown optimizer {optim.optimizer!r}")


def create_train_state(params, optim: OptimConfig, rng: jax.Array) -> TrainState:
    tx = make_optimizer(optim)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        ema=ema_init(params),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )
