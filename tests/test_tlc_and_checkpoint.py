"""TLC (test-time local converter) tests + checkpoint round-trip +
trainer-loop behavior on CPU."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavedm_tpu.ops.tlc import local_avg_pool, tlc_kernel

pytestmark = pytest.mark.slow  # fast tier: -m 'not slow'


def test_local_avg_pool_matches_naive(rng):
    x = jnp.asarray(rng.standard_normal((1, 10, 12, 2)).astype(np.float32))
    out = np.asarray(local_avg_pool(x, (4, 4)))
    xn = np.asarray(x)
    # interior entries equal plain window means of the VALID sweep
    valid = np.zeros((7, 9, 2), np.float32)
    for i in range(7):
        for j in range(9):
            valid[i, j] = xn[0, i:i + 4, j:j + 4].mean(axis=(0, 1))
    ph, pw = 10 - 7, 12 - 9
    np.testing.assert_allclose(
        out[0, ph // 2:ph // 2 + 7, pw // 2:pw // 2 + 9], valid, atol=1e-5)
    # border is replicate padding
    np.testing.assert_allclose(out[0, 0], out[0, ph // 2], atol=1e-6)


def test_local_avg_pool_degenerates_to_global(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 3)).astype(np.float32))
    out = np.asarray(local_avg_pool(x, (6, 6)))
    g = np.asarray(x).mean(axis=(1, 2), keepdims=True)
    np.testing.assert_allclose(out, np.broadcast_to(g, out.shape), atol=1e-6)


def test_tlc_kernel_rule():
    assert tlc_kernel((480, 720), (256, 256), (256, 256)) == (480, 720)
    assert tlc_kernel((512, 512), (256, 256), (128, 128)) == (256, 256)


def test_hfrm_tlc_option_changes_large_input_only(rng):
    """At the train size TLC reduces to global pooling (same output); at a
    larger size the outputs diverge."""
    from wavedm_tpu.models.hfrm import HFRM
    kw = dict(dim=8, mid_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
    base = HFRM(**kw)
    tlc = HFRM(tlc=((16, 16), (16, 16)), **kw)
    x_small = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    params = base.init(jax.random.PRNGKey(0), x_small)["params"]
    # beta/gamma are zero-initialised, making every block an identity and
    # hiding the attention path -- set them to 1 so ChannelAttn matters
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.ones_like(v)
        if p[-1].key in ("beta", "gamma") else v, params)
    y0 = base.apply({"params": params}, x_small)
    y1 = tlc.apply({"params": params}, x_small)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=5e-5)

    # a TLC instance built for the larger geometry (base = train crop 16,
    # input 32) pools locally -> outputs diverge from global pooling
    tlc_big = HFRM(tlc=((16, 16), (32, 32)), **kw)
    x_big = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    yb0 = base.apply({"params": params}, x_big)
    yb1 = tlc_big.apply({"params": params}, x_big)
    assert np.abs(np.asarray(yb0) - np.asarray(yb1)).max() > 1e-6


def test_checkpoint_roundtrip(tmp_path):
    from wavedm_tpu.config import OptimConfig
    from wavedm_tpu.training.state import create_train_state
    from wavedm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    state = create_train_state(params, OptimConfig(), jax.random.PRNGKey(5))
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, epoch=7, extra={"note": 1.5})

    state2, meta = load_checkpoint(path, state)
    assert int(state2.step) == 42
    assert int(meta["epoch"]) == 7
    assert float(meta["note"]) == 1.5
    np.testing.assert_array_equal(np.asarray(state2.params["w"]),
                                  np.asarray(params["w"]))
    np.testing.assert_array_equal(np.asarray(state2.ema["b"]),
                                  np.asarray(params["b"]))
    # load without template
    state3, _ = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(state3.params["w"]),
                                  np.asarray(params["w"]))


def test_hfrm_trainer_smoke_cpu():
    """Short HFRM training on CPU through the trainer loop: loss finite,
    PSNR tracked, 'lastest' checkpoint written, identity init applied."""
    import dataclasses

    from wavedm_tpu.config import Config, HFRMConfig
    from wavedm_tpu.training.hfrm_trainer import HFRMTrainer

    cfg = Config()
    cfg.hfrm = HFRMConfig(dim=8, enc_blk_nums=(1, 1), middle_blk_num=1,
                          dec_blk_nums=(1, 1), n_epochs=2)
    rng = np.random.default_rng(0)

    def batches(epoch):
        for _ in range(3):
            gt = rng.random((2, 32, 32, 3)).astype(np.float32)
            cond = np.clip(gt + 0.1 * rng.standard_normal((2, 32, 32, 3))
                           .astype(np.float32), 0, 1)
            yield np.concatenate([cond, gt], axis=-1)

    trainer = HFRMTrainer(cfg, use_mesh=False, log_fn=lambda s: None)
    # identity-center init: initial forward ~ identity + residual
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        trainer.fit(batches, max_steps=4, ckpt_dir=d)
        assert int(trainer.state.step) == 4
        assert os.path.exists(os.path.join(d, "lastest"))


def test_find_latest_checkpoint(tmp_path):
    import time as _time

    from wavedm_tpu.config import OptimConfig
    from wavedm_tpu.training.state import create_train_state
    from wavedm_tpu.utils.checkpoint import (
        find_latest_checkpoint,
        save_checkpoint,
    )

    assert find_latest_checkpoint(str(tmp_path)) is None
    params = {"w": jnp.ones(2)}
    state = create_train_state(params, OptimConfig(), jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path / "epoch1"), state, epoch=1)
    _time.sleep(0.05)
    save_checkpoint(str(tmp_path / "epoch2"), state, epoch=2)
    latest = find_latest_checkpoint(str(tmp_path))
    assert latest.endswith("epoch2")


def test_tv_loss_matches_reference_formula(rng):
    import torch

    from wavedm_tpu.training.hfrm_trainer import tv_loss

    x = rng.random((2, 6, 7, 3)).astype(np.float32)
    ours = float(tv_loss(jnp.asarray(x)))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)  # reference is NCHW
    h_x, w_x = t.size(2), t.size(3)
    count_h = t[:, :, 1:, :].numel() / 2  # _tensor_size excludes batch
    count_w = t[:, :, :, 1:].numel() / 2
    h_tv = ((t[:, :, 1:] - t[:, :, :h_x - 1]) ** 2).sum()
    w_tv = ((t[:, :, :, 1:] - t[:, :, :, :w_x - 1]) ** 2).sum()
    ref = float(2 * (h_tv / count_h + w_tv / count_w) / 2)
    assert ours == pytest.approx(ref, rel=1e-5)


def test_diffusion_trainer_snapshot_and_resume(tmp_path):
    """DiffusionTrainer.fit writes snapshots; a fresh trainer resumes from
    them and continues at the right step (the reference's --resume flow,
    models/ddm_wavelet.py:180-190)."""
    import dataclasses

    from wavedm_tpu.config import (
        Config,
        DataConfig,
        DiffusionConfig,
        ModelConfig,
        TrainingConfig,
    )
    from wavedm_tpu.training.trainer import DiffusionTrainer

    cfg = Config()
    cfg.data = DataConfig(image_size=8, patch_size=32, wavelet=True)
    cfg.model = ModelConfig(
        in_channels=48, out_ch=3, pred_channels=3, use_other_channels=True,
        other_channels_begin=3, use_gt_in_train=True, ch=32, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=())
    cfg.diffusion = DiffusionConfig(num_diffusion_timesteps=20)
    cfg.training = TrainingConfig(patch_n=2, batch_size=1, n_epochs=100,
                                  snapshot_freq=3, validation_freq=1000)
    cfg.validate()

    rng = np.random.default_rng(0)

    def batches(epoch):
        for _ in range(4):
            yield rng.random((2, 32, 32, 6)).astype(np.float32)

    t1 = DiffusionTrainer(cfg, use_mesh=False, log_fn=lambda s: None)
    t1.fit(batches, max_steps=4, ckpt_dir=str(tmp_path))
    snaps = [d for d in os.listdir(tmp_path) if "ddpm" in d]
    assert snaps, "no snapshot written at snapshot_freq=3"

    t2 = DiffusionTrainer(cfg, use_mesh=False, log_fn=lambda s: None)
    t2.resume(os.path.join(str(tmp_path), snaps[0]))
    assert int(t2.state.step) == 3
    l1 = jax.tree_util.tree_leaves(t1.state.ema)[0]
    # resumed EMA exists and training continues
    t2.fit(batches, max_steps=5, ckpt_dir=None)
    assert int(t2.state.step) == 5


def test_missing_extras_degrade_gracefully(tmp_path):
    """Resuming with an extras_template for a key the checkpoint never
    stored must return empty extras, not crash inside orbax (ADVICE r2:
    lap-configured resume from a pre-lap checkpoint)."""
    import jax
    import jax.numpy as jnp
    from wavedm_tpu.training.state import TrainState
    from wavedm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    st = TrainState(params={"w": jnp.ones((2,))},
                    opt_state={"m": jnp.zeros((2,))},
                    ema={"w": jnp.ones((2,))},
                    step=jnp.zeros((), jnp.int32),
                    rng=jax.random.PRNGKey(0))
    p = str(tmp_path / "ck")
    save_checkpoint(p, st, epoch=3)  # saved WITHOUT extras
    s2, meta, extras = load_checkpoint(
        p, st, extras_template={"lap": {"x": jnp.ones((3,))}})
    assert extras == {}
    assert int(meta["epoch"]) == 3
    # extras that WERE saved still round-trip
    save_checkpoint(p + "2", st, epoch=4,
                    extra_arrays={"lap": {"x": jnp.full((3,), 7.0)}})
    _, _, ex = load_checkpoint(
        p + "2", st, extras_template={"lap": {"x": jnp.zeros((3,))}})
    np.testing.assert_array_equal(np.asarray(ex["lap"]["x"]), [7.0, 7.0, 7.0])
