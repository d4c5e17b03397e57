"""Diffusion beta schedules and alpha-bar computation.

Pure functions over numpy/jax arrays; numerics match the reference
(``get_beta_schedule`` at models/ddm.py:83-101 and models/ddm_wavelet.py:88-106;
``compute_alpha`` at utils/sampling.py:10-13): betas are built in float64 and
alpha-bars are cumulative products over (1 - beta) with an implicit
alpha_bar(-1) = 1 boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["get_beta_schedule", "compute_alpha", "alpha_bars", "ddim_timesteps"]


def get_beta_schedule(
    beta_schedule: str,
    *,
    beta_start: float,
    beta_end: float,
    num_diffusion_timesteps: int,
) -> np.ndarray:
    """Return the (T,) float64 beta schedule.

    Supports the reference's five schedules: linear, quad, const, jsd, sigmoid.
    """
    T = num_diffusion_timesteps
    if beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, T, dtype=np.float64)
    elif beta_schedule == "quad":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, T, dtype=np.float64) ** 2
    elif beta_schedule == "const":
        betas = np.full(T, beta_end, dtype=np.float64)
    elif beta_schedule == "jsd":
        # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(T, 1, T, dtype=np.float64)
    elif beta_schedule == "sigmoid":
        xs = np.linspace(-6, 6, T)
        betas = 1.0 / (1.0 + np.exp(-xs)) * (beta_end - beta_start) + beta_start
    else:
        raise NotImplementedError(f"beta schedule {beta_schedule!r}")
    assert betas.shape == (T,)
    return betas


def alpha_bars(betas: jax.Array) -> jax.Array:
    """(T+1,) cumulative prod of (1 - beta) with alpha_bar[0] = 1 (the t = -1
    boundary the reference encodes by prepending a zero beta,
    utils/sampling.py:11)."""
    a = jnp.cumprod(1.0 - betas)
    return jnp.concatenate([jnp.ones((1,), dtype=a.dtype), a])


def compute_alpha(betas: jax.Array, t: jax.Array) -> jax.Array:
    """alpha_bar(t) for integer timesteps t (t = -1 maps to 1.0).

    Equivalent to the reference's ``compute_alpha`` (utils/sampling.py:10-13)
    but returns shape (len(t),) — callers broadcast as needed.
    """
    abar = alpha_bars(betas)
    return jnp.take(abar, t + 1, axis=0)


def ddim_timesteps(num_diffusion_timesteps: int, sampling_timesteps: int) -> np.ndarray:
    """The uniform-skip DDIM timestep sequence, ascending.

    Matches ``range(0, T, T // sampling_timesteps)``
    (models/ddm_wavelet.py:296-297): e.g. T=1000, 25 steps -> [0, 40, ..., 960].
    """
    skip = num_diffusion_timesteps // sampling_timesteps
    return np.arange(0, num_diffusion_timesteps, skip, dtype=np.int32)
