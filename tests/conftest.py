"""Test configuration: force an 8-device virtual CPU mesh.

Tests never run on the real TPU; sharding tests exercise multi-chip layouts on
virtual CPU devices.  Note: on this host the axon TPU plugin ignores the
``JAX_PLATFORMS`` env var, so the platform must be forced through
``jax.config`` (env XLA_FLAGS still must be set before the backend
initialises to get the 8 virtual host devices).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# CPU-only tests must never block on the real device's single-flight lock
# (tests that exercise tpu_lock itself re-enable it with a private path)
os.environ.setdefault("WAVEDM_TPU_LOCK_DISABLE", "1")

import jax  # noqa: E402  (import before any backend touch)

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return np.random.default_rng(61)
