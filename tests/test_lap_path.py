"""End-to-end Laplacian-path tests (``data.lap``).

Covers the reference's lap wiring (models/ddm.py:131-138, 195-204, 230-232,
329-380): joint translator training with its own Adam + per-epoch cosine LR,
diffusion on the coarse pyramid level, restore-side recombination with the
degraded high bands and GT low band, and the pyramid recon identities
(the reference's ``x_check1..4``, models/ddm.py:337-355)."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavedm_tpu.config import (
    Config, ConfigError, DataConfig, DiffusionConfig, ModelConfig,
    SamplingConfig)
from wavedm_tpu.models.laplacian import LaplacianPyramid, LapHighTrans
from wavedm_tpu.models.unet import DiffusionUNet
from wavedm_tpu.training.lap import (
    LAP_LR, LAP_NUM_HIGH, create_lap_state, lap_lr_for_epoch)
from wavedm_tpu.training.state import create_train_state
from wavedm_tpu.training.train_step import data_transform, make_train_step

pytestmark = pytest.mark.slow  # fast tier: -m 'not slow'


def lap_config(**sampling_overrides) -> Config:
    cfg = Config()
    cfg.data = DataConfig(image_size=16, patch_size=16, wavelet=False,
                          lap=True)
    cfg.model = ModelConfig(
        in_channels=3, out_ch=3, pred_channels=3, use_other_channels=False,
        other_channels_begin=0, use_gt_in_train=False, ch=32, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(4,), dropout=0.0)
    cfg.diffusion = DiffusionConfig(num_diffusion_timesteps=20)
    cfg.sampling = SamplingConfig(sampling_timesteps=5,
                                  **sampling_overrides)
    cfg.training.n_epochs = 10
    return cfg.validate()


# --------------------------------------------------------------------- config

def test_config_rejects_unsupported_lap_combos():
    for kw in ({"wavelet": True, "image_size": 4},
               {"use_fft": True},
               {"global_attn": True}):
        base = dict(lap=True, patch_size=16, image_size=16, wavelet=False)
        base.update(kw)
        with pytest.raises(ConfigError):
            DataConfig(**base).validate()


def test_lap_lr_schedule_matches_torch_cosine():
    n = 100
    assert lap_lr_for_epoch(0, n) == pytest.approx(LAP_LR)
    assert lap_lr_for_epoch(n, n) == pytest.approx(0.0, abs=1e-12)
    # torch CosineAnnealingLR: eta * (1 + cos(pi e / T)) / 2
    for e in (1, 25, 50, 99):
        assert lap_lr_for_epoch(e, n) == pytest.approx(
            LAP_LR * (1 + math.cos(math.pi * e / n)) / 2)


# ----------------------------------------------------------------- train step

@pytest.fixture(scope="module")
def lap_setup():
    cfg = lap_config()
    model = DiffusionUNet.from_config(cfg)
    key = jax.random.PRNGKey(0)
    # UNet trains on the coarse level: (patch/4)^2, 6 channels [cond|xt]
    params = model.init(key, jnp.zeros((1, 4, 4, 6)), jnp.zeros((1,)))["params"]
    state = create_train_state(params, cfg.optim, jax.random.PRNGKey(1))
    _, lap_state = create_lap_state(jax.random.PRNGKey(2), cfg.data.patch_size)
    batch = jax.random.uniform(jax.random.PRNGKey(3), (4, 16, 16, 6))
    return cfg, model, state, lap_state, batch


def test_lap_step_trains_both_models(lap_setup):
    cfg, model, state, lap_state, batch = lap_setup
    step = make_train_step(cfg, model.apply, donate=False)
    s, ls = state, lap_state
    trans_losses, losses = [], []
    for _ in range(12):
        s, ls, m = step(s, ls, batch, lap_lr_for_epoch(0, 10))
        trans_losses.append(float(m.loss_trans))
        losses.append(float(m.loss))
    assert int(s.step) == 12
    assert all(np.isfinite(trans_losses)) and all(np.isfinite(losses))
    # the translator objective drops on a fixed batch (the diffusion
    # eps-loss trend is covered by test_train_step at realistic sizes --
    # at 4x4 with a fresh t draw per step it is noise-dominated)
    assert np.mean(trans_losses[-3:]) < np.mean(trans_losses[:3]) * 0.9
    # both param trees actually moved
    for before, after in ((lap_state.params, ls.params),
                          (state.params, s.params)):
        d0 = jax.tree_util.tree_leaves(before)[0]
        d1 = jax.tree_util.tree_leaves(after)[0]
        assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_lap_step_diffusion_input_is_coarse_level(lap_setup):
    """The diffusion loss must see pyr[-1]: its eps/x0 shapes are at
    patch/4 (reference trains on lap_pyr[-1], models/ddm.py:186-188)."""
    cfg, model, state, lap_state, batch = lap_setup
    lap = LaplacianPyramid(LAP_NUM_HIGH)
    pyr = lap.decompose(data_transform(batch))
    assert pyr[-1].shape == (4, 4, 4, 6)
    # num_of_pixel metric normalisation uses config image_size (reference
    # quirk: models/ddm.py:203 normalises by the PIXEL crop area even though
    # the loss lives on the coarse level)
    step = make_train_step(cfg, model.apply, donate=False)
    s, ls, m = step(state, lap_state, batch, 2e-4)
    assert float(m.loss_per_pixel) == pytest.approx(
        float(m.loss) / (3 * cfg.data.image_size ** 2), rel=1e-5)


def test_lap_translator_matches_reference_objective(lap_setup):
    """loss_trans == sum_level MSE(trans(cond levels)[l], gt high band l)
    (reference train_the_lap_loss, models/ddm.py:195-204)."""
    cfg, model, state, lap_state, batch = lap_setup
    from wavedm_tpu.training.lap import make_lap_model
    lap = LaplacianPyramid(LAP_NUM_HIGH)
    pyr = lap.decompose(data_transform(batch))
    trans = make_lap_model().apply(
        {"params": lap_state.params}, [lvl[..., :3] for lvl in pyr])
    want = sum(float(jnp.mean(jnp.square(trans[l] - pyr[l][..., 3:])))
               for l in range(LAP_NUM_HIGH))
    step = make_train_step(cfg, model.apply, donate=False)
    _, _, m = step(state, lap_state, batch, 0.0)
    assert float(m.loss_trans) == pytest.approx(want, rel=1e-5)


# ------------------------------------------------------------ recon identities

def test_lap_recon_identities():
    """The reference's x_check sanity identities (models/ddm.py:337-355):
    reconstructing with the untouched pyramid returns the input; swapping the
    coarse cond/gt halves swaps the reconstructed halves."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 6)).astype(np.float32))
    lap = LaplacianPyramid(LAP_NUM_HIGH)
    pyr = lap.decompose(x)

    rec = lap.reconstruct(pyr)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)

    # x_check3/x_check4: coarse = [gt_lowf | cond_lowf] swaps output halves
    coarse = pyr[-1]
    swapped = jnp.concatenate([coarse[..., 3:], coarse[..., :3]], axis=-1)
    rec_sw = lap.reconstruct(list(pyr[:-1]) + [swapped])
    # [..., :3] = cond high bands + gt low band; [..., 3:] = gt high + cond low
    ref_a = lap.reconstruct(
        [lvl[..., :3] for lvl in pyr[:-1]] + [coarse[..., 3:]])
    np.testing.assert_allclose(np.asarray(rec_sw[..., :3]),
                               np.asarray(ref_a), atol=1e-5)


def test_lap_restore_is_identity_for_oracle_output():
    """If the diffusion output equals the true cond low band, the lap
    recombination reproduces the cond image exactly (the x_check3 identity
    through the restore path)."""
    rng = np.random.default_rng(1)
    pair = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 6)).astype(np.float32))
    x6 = data_transform(pair)
    lap = LaplacianPyramid(LAP_NUM_HIGH)
    pyr = lap.decompose(x6)
    coarse = pyr[-1]
    # restore-side recombination (restoration._build_lap_restore.recombine)
    pyr_out = list(pyr[:-1]) + [
        jnp.concatenate([coarse[..., :3], coarse[..., 3:]], axis=-1)]
    rec = lap.reconstruct(pyr_out)
    out = jnp.clip((rec[..., :3] + 1) / 2, 0, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pair[..., :3]),
                               atol=1e-5)


# ----------------------------------------------------------------- end-to-end

def test_lap_restoration_runs():
    cfg = lap_config(jit_mode="scan", grid_r=2)
    cfg.data.image_size = 8  # tiled patch in the coarse domain
    model = DiffusionUNet.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 6)),
                        jnp.zeros((1,)))["params"]
    from wavedm_tpu.inference.restoration import DiffusiveRestoration
    restorer = DiffusiveRestoration(cfg, model.apply, params)
    pair = np.random.default_rng(2).uniform(
        0, 1, (1, 48, 64, 6)).astype(np.float32)
    out, _ = restorer.restore_image(pair)
    assert out.shape == (1, 48, 64, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0
    # cond-only input must be rejected on the lap path
    with pytest.raises(ValueError):
        DiffusiveRestoration(cfg, model.apply, params).restore_image(
            pair[..., :3])


def test_lap_trainer_checkpoint_roundtrip(tmp_path):
    cfg = lap_config()
    from wavedm_tpu.training.trainer import DiffusionTrainer
    tr = DiffusionTrainer(cfg, use_mesh=False, log_fn=lambda s: None)
    batch = np.random.default_rng(3).uniform(
        0, 1, (4, 16, 16, 6)).astype(np.float32)
    tr.fit(lambda epoch: [batch, batch], max_steps=2)
    assert tr.lap_state is not None
    path = os.path.join(str(tmp_path), "lap_ckpt")
    tr.save(path)

    tr2 = DiffusionTrainer(cfg, use_mesh=False, log_fn=lambda s: None)
    tr2.resume(path)
    assert int(tr2.state.step) == int(tr.state.step)
    for a, b in zip(jax.tree_util.tree_leaves(tr.lap_state.params),
                    jax.tree_util.tree_leaves(tr2.lap_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
