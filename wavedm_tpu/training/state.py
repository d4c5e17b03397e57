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


def make_optimizer(optim: OptimConfig) -> optax.GradientTransformation:
    if optim.optimizer == "Adam":
        tx = optax.adamw(
            learning_rate=optim.lr, b1=optim.beta1, b2=optim.beta2,
            eps=optim.eps, weight_decay=optim.weight_decay,
        ) if optim.weight_decay else optax.adam(
            learning_rate=optim.lr, b1=optim.beta1, b2=optim.beta2,
            eps=optim.eps)
        if optim.amsgrad:
            tx = optax.amsgrad(learning_rate=optim.lr, b1=optim.beta1,
                               b2=optim.beta2, eps=optim.eps)
        return tx
    if optim.optimizer == "RMSProp":
        return optax.rmsprop(learning_rate=optim.lr, decay=0.99, eps=1e-8)
    if optim.optimizer == "SGD":
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
