"""Optimizer-factory and weight-init parity vs the reference
(utils/optimize.py:5-35): torch-coupled L2 weight decay, amsgrad+wd
composition, RMSProp decay semantics, and the weights_init flavours."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wavedm_tpu.config import OptimConfig
from wavedm_tpu.training.state import make_optimizer
from wavedm_tpu.utils.initializers import apply_weights_init, weights_init


def _run_optax(tx, p0, grads):
    params = jnp.asarray(p0)
    st = tx.init(params)
    for g in grads:
        u, st = tx.update(jnp.asarray(g), st, params)
        params = params + u
    return np.asarray(params)


def _run_torch(opt_ctor, p0, grads):
    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = opt_ctor([tp])
    for g in grads:
        tp.grad = torch.tensor(g)
        opt.step()
    return tp.detach().numpy()


@pytest.mark.parametrize("amsgrad", [False, True])
@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_adam_matches_torch(amsgrad, wd):
    """torch Adam applies weight_decay as coupled L2 *before* the adaptive
    scaling, and amsgrad composes with it (reference utils/optimize.py:7-8)."""
    oc = OptimConfig(optimizer="Adam", lr=1e-3, weight_decay=wd,
                     amsgrad=amsgrad)
    p0 = np.random.RandomState(0).randn(7).astype(np.float32)
    grads = np.random.RandomState(1).randn(6, 7).astype(np.float32)
    ours = _run_optax(make_optimizer(oc), p0, grads)
    ref = _run_torch(
        lambda ps: torch.optim.Adam(ps, lr=1e-3, weight_decay=wd,
                                    betas=(0.9, 0.999), amsgrad=amsgrad,
                                    eps=1e-8),
        p0, grads)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_rmsprop_matches_torch():
    oc = OptimConfig(optimizer="RMSProp", lr=1e-3, weight_decay=0.01)
    p0 = np.random.RandomState(2).randn(7).astype(np.float32)
    grads = np.random.RandomState(3).randn(6, 7).astype(np.float32)
    ours = _run_optax(make_optimizer(oc), p0, grads)
    ref = _run_torch(
        lambda ps: torch.optim.RMSprop(ps, lr=1e-3, weight_decay=0.01),
        p0, grads)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_sgd_matches_torch():
    oc = OptimConfig(optimizer="SGD", lr=1e-2)
    p0 = np.random.RandomState(4).randn(7).astype(np.float32)
    grads = np.random.RandomState(5).randn(6, 7).astype(np.float32)
    ours = _run_optax(make_optimizer(oc), p0, grads)
    ref = _run_torch(lambda ps: torch.optim.SGD(ps, lr=1e-2, momentum=0.9),
                     p0, grads)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


@pytest.mark.parametrize("flavour,std_fn", [
    ("gaussian", lambda fi, fo: 0.02),
    ("xavier", lambda fi, fo: math.sqrt(2) * math.sqrt(2.0 / (fi + fo))),
    ("kaiming", lambda fi, fo: math.sqrt(2.0 / fi)),
])
def test_weights_init_std(flavour, std_fn):
    """Each flavour reproduces torch.nn.init's std on HWIO conv kernels."""
    shape = (3, 3, 32, 64)  # fan_in = 3*3*32, fan_out = 3*3*64
    k = weights_init(flavour)(jax.random.PRNGKey(0), shape, jnp.float32)
    fi, fo = 3 * 3 * 32, 3 * 3 * 64
    assert abs(float(jnp.std(k)) - std_fn(fi, fo)) < 0.1 * std_fn(fi, fo)
    assert abs(float(jnp.mean(k))) < 0.01


def test_weights_init_orthogonal():
    """orthogonal(gain=sqrt(2)): rows/cols orthogonal with norm ~ gain."""
    shape = (1, 1, 16, 8)
    k = weights_init("orthogonal")(jax.random.PRNGKey(0), shape, jnp.float32)
    m = np.asarray(k).reshape(16, 8)  # 8 orthogonal columns
    gram = m.T @ m
    np.testing.assert_allclose(gram, 2.0 * np.eye(8), atol=1e-5)


def test_apply_weights_init_tree():
    """Kernels redrawn, biases zeroed, norm params untouched -- the
    functional equivalent of ``module.apply(weights_init(...))``."""
    params = {
        "conv": {"kernel": jnp.ones((3, 3, 4, 8)), "bias": jnp.ones(8)},
        "norm": {"scale": jnp.full(4, 2.0), "bias": jnp.full(4, 3.0)},
    }
    out = apply_weights_init(params, "kaiming", jax.random.PRNGKey(7))
    assert float(jnp.std(out["conv"]["kernel"])) > 0.05
    assert float(jnp.max(jnp.abs(out["conv"]["bias"]))) == 0.0
    np.testing.assert_array_equal(out["norm"]["scale"], params["norm"]["scale"])
    # norm bias is named 'bias' too -- zeroed like the reference's
    # init_fun (it zeroes any m.bias on matched modules only; our tree pass
    # zeroes leaves named 'bias', conservative superset documented in-module)
    assert float(jnp.max(jnp.abs(out["norm"]["bias"]))) == 0.0
    assert apply_weights_init(params, "default", jax.random.PRNGKey(0)) is params


def test_weights_init_unknown_flavour():
    with pytest.raises(ValueError):
        weights_init("nope")


def test_torch_ema_checkpoint_import(tmp_path):
    """load_torch_checkpoint(ema=True) reads the ema_helper shadow --
    the weights a reference eval with ema=True would use
    (models/ddm.py:31-80, save at models/ddm_wavelet.py:282-292)."""
    from wavedm_tpu.utils.torch_compat import load_torch_checkpoint

    sd = {"conv_in.weight": torch.randn(4, 3, 3, 3)}
    ema = {"conv_in.weight": torch.randn(4, 3, 3, 3)}
    path = str(tmp_path / "ckpt.pth.tar")
    torch.save({"state_dict": sd, "ema_helper": ema, "epoch": 3}, path)

    got = load_torch_checkpoint(path)
    np.testing.assert_array_equal(got["conv_in.weight"],
                                  sd["conv_in.weight"].numpy())
    got_ema = load_torch_checkpoint(path, ema=True)
    np.testing.assert_array_equal(got_ema["conv_in.weight"],
                                  ema["conv_in.weight"].numpy())

    torch.save({"state_dict": sd}, path)
    with pytest.raises(KeyError):
        load_torch_checkpoint(path, ema=True)
