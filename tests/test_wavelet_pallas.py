"""Pallas wavelet kernel tests (interpret mode; numerics vs the XLA op)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavedm_tpu.ops.wavelet import wavelet_dec, wavelet_rec
from wavedm_tpu.ops.wavelet_pallas import wavelet_dec_pallas, wavelet_rec_pallas


@pytest.mark.parametrize("shape", [(2, 64, 48, 3), (1, 480, 720, 3)])
def test_pallas_dec_matches_xla(rng, shape):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    zp = wavelet_dec_pallas(x, interpret=True)
    zr = wavelet_dec(x)
    assert zp.shape == zr.shape
    np.testing.assert_allclose(np.asarray(zp), np.asarray(zr), atol=2e-6)


def test_pallas_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    z = wavelet_dec_pallas(x, interpret=True)
    back = wavelet_rec_pallas(z, interpret=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=2e-6)


def test_pallas_rec_matches_xla(rng):
    z = jnp.asarray(rng.standard_normal((1, 16, 12, 48)).astype(np.float32))
    yp = wavelet_rec_pallas(z, interpret=True)
    yr = wavelet_rec(z)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yr), atol=2e-6)
