"""Weight-init helpers mirroring the reference's ``weights_init`` factory
(utils/optimize.py:15-35): gaussian / xavier / kaiming / orthogonal flavours
applied to conv + linear kernels, biases zeroed.

The reference applies these via ``nn.Module.apply`` (e.g. ``Lap_high_trans``
inits Trans_high with 'kaiming', models/Lap.py:128).  Here each flavour is
exposed two ways: as a Flax initializer (for ``nn.Conv(kernel_init=...)``)
and as ``apply_weights_init``, a pytree pass re-initialising an existing
params tree -- the functional equivalent of ``module.apply(init_fun)``.

Gain/fan conventions are matched to torch.nn.init on the NHWC/HWIO layout:
  gaussian   normal(0, 0.02)
  xavier     xavier_normal_(gain=sqrt(2)):  std = sqrt(2)*sqrt(2/(fi+fo))
  kaiming    kaiming_normal_(a=0, fan_in):  std = sqrt(2/fan_in)
  orthogonal orthogonal_(gain=sqrt(2))
For an HWIO conv kernel torch's fan_in = I*kh*kw and fan_out = O*kh*kw,
identical to jax's ``variance_scaling`` fans on the same shape.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.nn import initializers as jinit


def weights_init(init_type: str = "gaussian") -> Callable:
    """Return a Flax kernel initializer matching the reference flavour."""
    if init_type == "gaussian":
        return jinit.normal(stddev=0.02)
    if init_type == "xavier":
        # torch xavier_normal_(gain): std = gain * sqrt(2 / (fan_in+fan_out))
        # = variance_scaling(scale=gain^2, fan_avg, normal) since that gives
        # std = sqrt(scale / ((fi+fo)/2)) = gain*sqrt(2/(fi+fo)).
        return jinit.variance_scaling(2.0, "fan_avg", "normal")
    if init_type == "kaiming":
        # torch kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2/fan_in)
        return jinit.variance_scaling(2.0, "fan_in", "normal")
    if init_type == "orthogonal":
        return jinit.orthogonal(scale=math.sqrt(2.0))
    if init_type == "default":
        return lambda key, shape, dtype=jnp.float32: None  # sentinel; unused
    raise ValueError(f"Unsupported initialization: {init_type}")


def apply_weights_init(params: Any, init_type: str, rng: jax.Array) -> Any:
    """Re-initialise an existing params tree like ``module.apply(init_fun)``:
    kernels of convs/linears (ndim >= 2 leaves named 'kernel') are redrawn,
    biases zeroed, everything else (norm scales etc.) left untouched."""
    if init_type == "default":
        return params
    init = weights_init(init_type)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(rng, max(len(flat), 1))
    out = []
    for key, (path, leaf) in zip(keys, flat):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and jnp.ndim(leaf) >= 2:
            out.append(jnp.asarray(init(key, leaf.shape, leaf.dtype)))
        elif name == "bias":
            out.append(jnp.zeros_like(leaf))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
