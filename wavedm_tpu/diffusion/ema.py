"""Exponential moving average of parameters, as a pytree transform.

The reference maintains a per-name shadow dict updated after every optimizer
step with mu = 0.9999 (``EMAHelper``, models/ddm.py:31-80; note its config key
``model.ema_rate: 0.999`` is never read -- we honor the config value by
default and expose ``REFERENCE_MU`` for strict parity).

Here EMA is a pure function over parameter pytrees; under data-parallel
sharding the shadow inherits the parameters' (replicated or FSDP) sharding, so
the update runs once per shard rather than once per rank.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The reference hardcodes mu=0.9999 regardless of config (models/ddm.py:32).
REFERENCE_MU = 0.9999


def ema_init(params):
    """Shadow initialised to a COPY of params (EMAHelper.register).

    Must be a real copy, not an alias: with jit buffer donation an aliased
    shadow would donate the same buffer twice ("Attempt to donate the same
    buffer twice in Execute()").
    """
    return jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params)


def ema_update(shadow, params, mu: float = REFERENCE_MU):
    """shadow <- mu * shadow + (1 - mu) * params (EMAHelper.update)."""
    return jax.tree_util.tree_map(
        lambda s, p: mu * s + (1.0 - mu) * p, shadow, params)
