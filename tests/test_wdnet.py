"""WDNet legacy-stack tests: forward parity with the reference generator,
identity-center init semantics, discriminator shape."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavedm_tpu.models.wdnet import (
    Discriminator,
    WDNet,
    apply_identity_center_init,
    identity_center_init,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _conv(sd, k):
    out = {"kernel": np.transpose(sd[f"{k}.weight"], (2, 3, 1, 0))}
    if f"{k}.bias" in sd:
        out["bias"] = sd[f"{k}.bias"]
    return out


def _rdb(sd, p):
    # reference conv_block wraps the conv as Sequential index 0
    return {f"conv{i}": _conv(sd, f"{p}.conv{i}.0") for i in range(1, 6)}


def _convert_wdnet(sd):
    params = {
        "cascade1_conv1": _conv(sd, "cascade1.0"),
        "cascade1_conv2": _conv(sd, "cascade1.2"),
        "final": _conv(sd, "final.0.0"),
        "xbranch": _conv(sd, "xbranch.0.0"),
    }
    for i in range(7):
        p = f"cascade2.{i}"
        params[f"dmdb_{i}"] = {
            "rdb1": _rdb(sd, f"{p}.RDB1"),
            "rdb2": _rdb(sd, f"{p}.RDB2"),
            "deli": _conv(sd, f"{p}.deli.0"),
            "deli2": _conv(sd, f"{p}.deli2.0"),
        }
    return params


def test_wdnet_forward_parity():
    z = np.load(os.path.join(GOLDEN, "wdnet_small.npz"))
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
    model = WDNet()
    params = _convert_wdnet(sd)
    tmpl = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 48)))["params"]
    assert (jax.tree_util.tree_map(np.shape, params)
            == jax.tree_util.tree_map(np.shape, tmpl))
    x = jnp.asarray(z["x"].transpose(0, 2, 3, 1))
    y = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, x)
    ref = z["y"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-4, rtol=1e-3)


def test_identity_center_init_is_identity():
    # a 3x3 conv initialised identity-center must act as identity on equal
    # in/out channels
    w = identity_center_init(None, (3, 3, 4, 4))
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 6, 6, 4)).astype(np.float32))
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_apply_identity_center_init_only_touches_convs():
    model = WDNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 48)))["params"]
    inited = apply_identity_center_init(params)
    k = inited["cascade1_conv2"]["kernel"]
    assert float(jnp.abs(k[0, 0]).sum()) == 0.0  # zero off-center
    np.testing.assert_allclose(np.asarray(k[1, 1]), np.eye(64), atol=0)
    np.testing.assert_array_equal(
        np.asarray(inited["cascade1_conv1"]["bias"]),
        np.asarray(params["cascade1_conv1"]["bias"]))


def test_discriminator_patch_output(rng):
    d = Discriminator()
    a = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    v = d.init(jax.random.PRNGKey(0), a, b)
    out = d.apply(v, a, b)
    assert out.shape == (1, 4, 4, 1)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()
