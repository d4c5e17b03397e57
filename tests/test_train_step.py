"""Train-step tests: loss decreases, EMA semantics, DP/FSDP sharding on the
8-device virtual mesh, antithetic/noise reproducibility."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavedm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig
from wavedm_tpu.models.unet import DiffusionUNet
from wavedm_tpu.parallel.mesh import (
    batch_sharding,
    fsdp_param_shardings,
    make_mesh,
    replicated_sharding,
)
from wavedm_tpu.training.state import create_train_state
from wavedm_tpu.training.train_step import (
    make_train_step,
    prepare_wavelet_batch,
)


def tiny_config(**model_overrides) -> Config:
    cfg = Config()
    cfg.data = DataConfig(image_size=8, patch_size=32, wavelet=True)
    cfg.model = ModelConfig(
        in_channels=48, out_ch=3, pred_channels=3, use_other_channels=True,
        other_channels_begin=3, use_gt_in_train=True, ch=32, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(4,), dropout=0.0,
        **model_overrides)
    cfg.diffusion = DiffusionConfig(num_diffusion_timesteps=50)
    return cfg.validate()


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = DiffusionUNet.from_config(cfg)
    key = jax.random.PRNGKey(0)
    x_probe = jnp.zeros((1, 8, 8, 96))
    params = model.init(key, x_probe, jnp.zeros((1,)))["params"]
    state = create_train_state(params, cfg.optim, jax.random.PRNGKey(1))
    batch = jax.random.uniform(jax.random.PRNGKey(2), (8, 32, 32, 6))
    return cfg, model, state, batch


def test_prepare_wavelet_batch_layout(setup):
    cfg, *_ = setup
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 6))
    out = prepare_wavelet_batch(x, cfg)
    assert out.shape == (2, 8, 8, 96)
    # channels: [cond 48 | gt LL 3 | gt HF 45]
    from wavedm_tpu.ops.wavelet import wavelet_dec
    gt_w = wavelet_dec(2 * x[..., 3:] - 1)
    np.testing.assert_allclose(np.asarray(out[..., 48:51]),
                               np.asarray(gt_w[..., :3]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[..., 51:]),
                               np.asarray(gt_w[..., 3:]), atol=1e-6)


def test_loss_decreases(setup):
    cfg, model, state, batch = setup
    step = make_train_step(cfg, model.apply, donate=False)
    losses = []
    s = state
    for _ in range(12):
        s, m = step(s, batch)
        losses.append(float(m.loss))
    assert int(s.step) == 12
    # eps-loss should drop substantially on a fixed small batch
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) * 0.9, losses


def test_ema_tracks_params(setup):
    cfg, model, state, batch = setup
    step = make_train_step(cfg, model.apply, donate=False)
    s, _ = step(state, batch)
    # after 1 step: ema = mu*p0 + (1-mu)*p1
    mu = cfg.model.ema_rate
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(s.params)[0]
    e1 = jax.tree_util.tree_leaves(s.ema)[0]
    np.testing.assert_allclose(np.asarray(e1), np.asarray(mu * p0 + (1 - mu) * p1),
                               atol=1e-6)


def test_dp_sharded_step_matches_single(setup, devices):
    cfg, model, state, batch = setup
    mesh = make_mesh(8)
    step_single = make_train_step(cfg, model.apply, donate=False)
    step_dp = make_train_step(cfg, model.apply, mesh=mesh, donate=False)

    s1, m1 = step_single(state, batch)
    repl = replicated_sharding(mesh)
    state_repl = jax.device_put(state, repl)
    batch_sh = jax.device_put(batch, batch_sharding(mesh))
    s2, m2 = step_dp(state_repl, batch_sh)

    np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=2e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)[0]
    l2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-5)


def test_fsdp_sharded_step_runs(setup, devices):
    cfg, model, state, batch = setup
    mesh = make_mesh(8)
    step_dp = make_train_step(cfg, model.apply, mesh=mesh, donate=False)

    shardings = fsdp_param_shardings(mesh, state.params)
    params = jax.device_put(state.params, shardings)
    # at least some tensors must actually be sharded
    specs = {s.spec for s in jax.tree_util.tree_leaves(shardings)}
    assert any(spec != () and any(a is not None for a in spec) for spec in specs)

    from wavedm_tpu.training.state import TrainState, create_train_state
    st = create_train_state(params, cfg.optim, jax.random.PRNGKey(1))
    st = dataclasses.replace(
        st, ema=jax.device_put(st.ema, shardings), step=st.step, rng=st.rng)
    batch_sh = jax.device_put(batch, batch_sharding(mesh))
    s2, m2 = step_dp(st, batch_sh)
    assert np.isfinite(float(m2.loss))
    # params keep their FSDP sharding across the step
    out_leaf = jax.tree_util.tree_leaves(s2.params)[0]
    assert len(out_leaf.sharding.device_set) == 8
