"""Patch-parallel restoration: DiffusiveRestoration(mesh=...) shards the
tiled sampler's (B*K)-patch UNet batch over the data mesh and must produce
EXACTLY the unsharded pipeline's output (collectives recombine the
scatter-add; eta=0 so there is no per-device randomness)."""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from wavedm_tpu.config import load_config
from wavedm_tpu.inference.loader import build_restorer
from wavedm_tpu.parallel.mesh import DATA_AXIS


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = load_config("wavedm_tpu/configs/raindrop.yaml")
    cfg.data.image_size = 8           # 8x8 patches on a 16x16 image
    cfg.model.ch = 32
    cfg.model.ch_mult = [1, 2]
    cfg.model.attn_resolutions = [4]
    cfg.model.num_res_blocks = 1
    cfg.sampling.sampling_timesteps = 2
    cfg.sampling.grid_r = 4           # K = 9 corners; B=8 -> 72 patches
    cfg.sampling.x0_pred_index = -1
    cfg.validate()
    return cfg


def test_sharded_restoration_equals_unsharded(tiny_cfg, devices):
    mesh = Mesh(np.asarray(devices[:8]), (DATA_AXIS,))
    r_plain = build_restorer(tiny_cfg, resume="")
    r_shard = build_restorer(tiny_cfg, resume="", mesh=mesh)
    # identical random-init weights (same seed path in the loader)
    batch = np.clip(np.random.default_rng(3).normal(
        0.5, 0.2, (8, 16, 16, 3)), 0, 1).astype(np.float32)
    rng = jax.random.PRNGKey(5)
    out_p, _ = r_plain.restore_image(batch, rng)
    out_s, _ = r_shard.restore_image(batch, rng)
    assert out_s.shape == out_p.shape == (8, 16, 16, 3)
    np.testing.assert_allclose(out_s, out_p, atol=2e-5, rtol=2e-5)
