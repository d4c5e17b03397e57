"""Parity tests for the auxiliary model families: SAM (IRNN sweeps),
Laplacian pyramid, and the global-attention UNet's structural behavior."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavedm_tpu.models.laplacian import LaplacianPyramid, LapHighTrans
from wavedm_tpu.models.sam import SAM, IRNNLayer
from wavedm_tpu.models.unet_global import DiffusionUNetGlobal

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    z = np.load(os.path.join(GOLDEN, name))
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
    data = {k: z[k] for k in z.files if not k.startswith("sd::")}
    return data, sd


# ----------------------------------------------------------------------- SAM

def _convert_sam_sd(sd):
    """Torch SAM state_dict -> our Flax params."""
    def conv(k):
        out = {"kernel": np.transpose(sd[f"{k}.weight"], (2, 3, 1, 0))}
        if f"{k}.bias" in sd:
            out["bias"] = sd[f"{k}.bias"]
        return out

    def irnn(prefix):
        return {name: np.asarray(sd[f"{prefix}.{name}"])
                for name in ("left_weight", "right_weight", "up_weight",
                             "down_weight", "zuoshang_weight", "zuoxia_weight",
                             "youshang_weight", "youxia_weight")}

    return {
        "attention_layer": {
            "conv3": conv("attention_layer.conv3"),
            "ca": {"fc1": conv("attention_layer.ca.fc1"),
                   "fc2": conv("attention_layer.ca.fc2")},
            "sa": {"conv1": conv("attention_layer.sa.conv1")},
        },
        "conv1": conv("conv1"),
        "conv2": conv("conv2"),
        "conv3": conv("conv3"),
        "conv_out": conv("conv_out"),
        "irnn1": irnn("irnn1"),
        "irnn2": irnn("irnn2"),
    }


def test_sam_forward_parity():
    data, sd = _load("sam_small.npz")
    model = SAM(out_channels=16)
    params = _convert_sam_sd(sd)
    ref_shapes = jax.tree_util.tree_map(
        lambda x: x.shape,
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 10, 64)))["params"])
    got_shapes = jax.tree_util.tree_map(np.shape, params)
    assert ref_shapes == got_shapes
    x = jnp.asarray(data["x"].transpose(0, 2, 3, 1))
    y = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, x)
    ref = data["y"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4, rtol=1e-3)


def test_irnn_down_sweep_semantics(rng):
    """Directional sweep must satisfy the recurrence
    y[i] = relu(y[i-1]*w + x[i]) with y[0] = x[0]."""
    x = rng.standard_normal((1, 5, 4, 2)).astype(np.float32)
    layer = IRNNLayer()
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    up, right, down, left, *_ = layer.apply({"params": params}, jnp.asarray(x))
    d = np.asarray(down)
    np.testing.assert_allclose(d[0, 0], x[0, 0], atol=1e-6)
    for i in range(1, 5):
        expect = np.maximum(d[0, i - 1] * 1.0 + x[0, i], 0)
        np.testing.assert_allclose(d[0, i], expect, atol=1e-6)


# ------------------------------------------------------------------ Laplacian

def test_lap_pyramid_matches_reference():
    data = np.load(os.path.join(GOLDEN, "lap_small.npz"))
    lap = LaplacianPyramid(num_high=3)
    x = jnp.asarray(data["x"].transpose(0, 2, 3, 1))
    pyr = lap.decompose(x)
    for i in range(4):
        ref = data[f"pyr{i}"].transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(pyr[i]), ref,
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=f"pyramid level {i}")
    rec = lap.reconstruct(pyr)
    np.testing.assert_allclose(np.asarray(rec),
                               data["rec"].transpose(0, 2, 3, 1),
                               atol=1e-5, rtol=1e-4)


def test_lap_recon_identity(rng):
    """decompose -> reconstruct must be an identity (the reference checks
    this at runtime via x_check tensors, models/ddm.py:337-353)."""
    lap = LaplacianPyramid(num_high=2)
    x = jnp.asarray(rng.standard_normal((1, 32, 48, 3)).astype(np.float32))
    rec = lap.reconstruct(lap.decompose(x))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)


def test_lap_high_trans_shapes(rng):
    lap = LaplacianPyramid(num_high=2)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    pyr = lap.decompose(x)
    model = LapHighTrans(res_num=1, num_high=2)
    params = model.init(jax.random.PRNGKey(0), pyr)["params"]
    out = model.apply({"params": params}, pyr)
    assert len(out) == 3
    for a, b in zip(out[:-1], pyr[:-1]):
        assert a.shape[:3] == b.shape[:3]
    np.testing.assert_array_equal(np.asarray(out[-1]), np.asarray(pyr[-1]))


# ------------------------------------------------------------- global UNet

def test_global_unet_runs_where_reference_crashes(rng):
    """The reference DiffusionUNet_Global crashes for any ch_mult whose last
    entry differs from its neighbor (verified directly against
    /root/reference); ours must run."""
    m = DiffusionUNetGlobal(in_channels=6, out_ch=3, ch=32, ch_mult=(1, 2),
                            num_res_blocks=1, attn_resolutions=(),
                            resolution=16, global_channels=3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6)).astype(np.float32))
    t = jnp.zeros((2,))
    g = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, t, g)
    y = m.apply(v, x, t, g)
    assert y.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(y)).all()
    # norm_global params exist (checkpoint parity) even though unused
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    names = {"/".join(p.key for p in path) for path, _ in flat}
    assert any("norm_global" in n for n in names)
