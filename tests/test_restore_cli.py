"""The ground-truth-free restore CLI (scripts/restore.py)."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # fast tier: -m 'not slow'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_restore_cli_end_to_end(tmp_path):
    """Tiny-config run over a 3-image folder: outputs written, no GT needed."""
    from PIL import Image

    cfg_path = str(tmp_path / "mini.yaml")
    with open(cfg_path, "w") as f:
        f.write("""
data: {image_size: 8, patch_size: 32, wavelet: true}
model: {ch: 32, ch_mult: [1, 2], num_res_blocks: 1, attn_resolutions: [4],
        use_gt_in_train: true}
diffusion: {num_diffusion_timesteps: 50}
sampling: {sampling_timesteps: 3, grid_r: 16}
hfrm: {dim: 4, enc_blk_nums: [1, 1], middle_blk_num: 1, dec_blk_nums: [1, 1]}
""")
    # checkpoints: random-init saved via the real trainers' state layout
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, REPO)
    from wavedm_tpu.config import load_config
    from wavedm_tpu.models.hfrm import HFRM
    from wavedm_tpu.models.unet import DiffusionUNet
    from wavedm_tpu.training.state import TrainState
    from wavedm_tpu.utils.checkpoint import save_checkpoint

    cfg = load_config(cfg_path)
    key = jax.random.PRNGKey(0)
    unet = DiffusionUNet.from_config(cfg)
    up = unet.init(key, jnp.zeros((1, 8, 8, cfg.model.unet_in_channels)),
                   jnp.zeros((1,)))["params"]
    hf = HFRM.from_config(cfg)
    hp = hf.init(key, jnp.zeros((1, 32, 32, 3)))["params"]

    def mk_state(p):
        return TrainState(params=p, opt_state={}, ema=p,
                          step=jnp.zeros((), jnp.int32), rng=key)

    save_checkpoint(str(tmp_path / "unet_ck"), mk_state(up))
    save_checkpoint(str(tmp_path / "hfrm_ck"), mk_state(hp))

    ind = tmp_path / "in"
    ind.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        arr = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(str(ind / f"img{i}.png"))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "scripts/restore.py", "--config", cfg_path,
         "--resume", str(tmp_path / "unet_ck"),
         "--hfrm-ckpt", str(tmp_path / "hfrm_ck"),
         "--input", str(ind), "--out", str(tmp_path / "out"),
         "--batch", "2", "--no-resize", "--x0-pred-index", "-1"],
        cwd=REPO, env=env, capture_output=True, timeout=900)
    assert r.returncode == 0, r.stderr.decode()[-3000:]
    outs = sorted(os.listdir(tmp_path / "out"))
    assert outs == ["img0_restored.png", "img1_restored.png",
                    "img2_restored.png"]
    out0 = np.asarray(Image.open(str(tmp_path / "out" / outs[0])))
    assert out0.shape == (48, 64, 3)
