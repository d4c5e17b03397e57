"""Laplacian-path training state: the learned high-frequency translator.

Reference wiring (models/ddm.py:131-138): ``data.lap`` builds
``Lap_Pyramid_Conv(num_high=2, channels=6)`` plus
``Lap_high_trans(res_num=3, res_dim=32, num_high=2)`` with its own
``Adam(lr=2e-4, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-8)`` and a
cosine LR (``CosineAnnealingLR(T_max=n_epochs)``) stepped once per epoch
(models/ddm.py:283-284).  Every train step the translator takes one Adam
step on the sum of per-level MSEs between its translated cond high bands
and the ground-truth high bands (``train_the_lap_loss``,
models/ddm.py:195-204); the diffusion model meanwhile trains on the
coarsest pyramid level.

Here the translator is an ordinary (params, opt_state) pytree advanced
inside the same jitted train step as the diffusion model -- the two
gradient computations are independent (the diffusion input ``pyr[-1]``
does not involve the translator), so the reference's
``backward(retain_graph=True)`` sequencing collapses into two pure
``value_and_grad`` calls in one program.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from wavedm_tpu.models.laplacian import LapHighTrans
from wavedm_tpu.utils.initializers import apply_weights_init

# Reference hyperparameters, hardcoded at models/ddm.py:133-138.
LAP_NUM_HIGH = 2
LAP_RES_NUM = 3
LAP_RES_DIM = 32
LAP_LR = 2e-4
LAP_WD = 1e-8


@struct.dataclass
class LapState:
    params: Any
    opt_state: Any


def make_lap_model() -> LapHighTrans:
    return LapHighTrans(res_num=LAP_RES_NUM, res_dim=LAP_RES_DIM,
                        num_high=LAP_NUM_HIGH)


def make_lap_optimizer() -> optax.GradientTransformation:
    """torch Adam semantics (coupled L2 ahead of the adaptive scaling,
    utils/optimize.py:8-10 convention); the learning rate is applied by the
    caller so the per-epoch cosine value can be a traced step argument."""
    return optax.chain(
        optax.add_decayed_weights(LAP_WD),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
    )


def lap_lr_for_epoch(epoch: int, n_epochs: int) -> float:
    """torch ``CosineAnnealingLR(T_max=n_epochs, eta_min=0)`` stepped once
    per epoch (models/ddm.py:138, 283-284): during epoch ``e`` the LR is
    ``2e-4 * (1 + cos(pi * e / n_epochs)) / 2``."""
    return LAP_LR * 0.5 * (1.0 + math.cos(math.pi * epoch / max(n_epochs, 1)))


def create_lap_state(rng: jax.Array, patch_size: int
                     ) -> Tuple[LapHighTrans, LapState]:
    """Init the translator params (kaiming, as models/Lap.py:128) and its
    optimizer state.  ``patch_size`` is the pixel-domain crop size; level
    ``i`` of the pyramid sits at ``patch_size / 2**i``."""
    model = make_lap_model()
    pyr = [jnp.zeros((1, patch_size // 2 ** i, patch_size // 2 ** i, 3),
                     jnp.float32)
           for i in range(LAP_NUM_HIGH + 1)]
    init_key, kaiming_key = jax.random.split(rng)
    params = jax.jit(model.init)(init_key, pyr)["params"]
    params = apply_weights_init(params, "kaiming", kaiming_key)
    tx = make_lap_optimizer()
    return model, LapState(params=params, opt_state=tx.init(params))
