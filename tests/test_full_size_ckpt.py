"""Full-size reference-checkpoint conversion proof.

Builds the reference PyTorch models at the SHIPPED full configuration
(DiffusionUNet at ch=128, ch_mult (1,2,4,6) -- configs/raindrop_wavelet.yml:29-31;
HFRM at dim=32, enc (2,2,2,4)/mid 6/dec (2,2,2,2) -- train_hfrm.py:150-154),
saves a reference-format ``.pth.tar`` ({epoch, step, state_dict, optimizer,
ema_helper, ...} -- models/ddm_wavelet.py:282-292), round-trips it through
``load_torch_checkpoint`` + the converters, and asserts tree-shape equality
and forward parity.  This is the key-map coverage a real trained reference
checkpoint would need (every ``down.{i}``/``up.{i}`` key at 4 levels).

The reference tree itself is imported at test time (the same import-only
pattern as tools/make_goldens.py -- no reference code is copied); the whole
module is skipped when torch or /root/reference is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # fast tier: -m 'not slow'

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
if not os.path.isdir(os.path.join(REFERENCE, "models")):
    pytest.skip("reference tree not available", allow_module_level=True)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wavedm_tpu.models.hfrm import HFRM  # noqa: E402
from wavedm_tpu.models.unet import DiffusionUNet  # noqa: E402
from wavedm_tpu.utils.torch_compat import (  # noqa: E402

    convert_hfrm_state_dict,
    convert_unet_state_dict,
    load_torch_checkpoint,
)

# full shipped config (configs/raindrop_wavelet.yml)
CH, CH_MULT, NUM_RES, ATTN = 128, (1, 2, 4, 6), 2, (16,)
UNET_PARAMS_EXPECTED = 156_492_675
HFRM_PARAMS_EXPECTED = 15_941_667


def _tree_shapes(tree):
    return {
        "/".join(str(getattr(p, "key", p)) for p in path): tuple(v.shape)
        for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


@pytest.fixture(scope="module")
def reference_models():
    from make_goldens import _install_reference_pkg, _ns
    cwd = os.getcwd()
    _install_reference_pkg()
    try:
        from models.unet import DiffusionUNet as RefUNet
        from models.arch import HFRM as RefHFRM

        config = _ns(
            data=_ns(use_window=False, window_size=2, wavelet_in_unet=False,
                     image_size=64, conditional=True),
            model=_ns(ch=CH, out_ch=3, ch_mult=list(CH_MULT),
                      num_res_blocks=NUM_RES, attn_resolutions=list(ATTN),
                      dropout=0.0, in_channels=48, pred_channels=3,
                      use_other_channels=True, other_channels_begin=3,
                      resamp_with_conv=True),
        )
        torch.manual_seed(0)
        unet = RefUNet(config).eval()
        torch.manual_seed(1)
        hfrm = RefHFRM(in_channel=3, dim=32, mid_blk_num=6,
                       enc_blk_nums=[2, 2, 2, 4],
                       dec_blk_nums=[2, 2, 2, 2]).eval()
        yield unet, hfrm
    finally:
        os.chdir(cwd)


@pytest.fixture(scope="module")
def reference_ckpt(reference_models, tmp_path_factory):
    """Save the reference's exact checkpoint dict shape
    (models/ddm_wavelet.py:282-292) with a distinguishable EMA shadow."""
    unet, _ = reference_models
    sd = unet.state_dict()
    ema = {k: v + 1e-3 for k, v in sd.items()}  # shifted shadow
    path = str(tmp_path_factory.mktemp("ckpt") / "raindrop_epoch1_ddpm.pth.tar")
    torch.save({
        "epoch": 1, "step": 10, "state_dict": sd,
        "optimizer": {}, "ema_helper": ema,
        "params": types.SimpleNamespace(), "config": types.SimpleNamespace(),
    }, path)
    return path


def test_full_size_unet_conversion_and_parity(reference_models, reference_ckpt):
    unet, _ = reference_models
    n_ref = sum(p.numel() for p in unet.parameters())
    assert n_ref == UNET_PARAMS_EXPECTED

    sd = load_torch_checkpoint(reference_ckpt)
    params = convert_unet_state_dict(
        sd, num_levels=len(CH_MULT), num_res_blocks=NUM_RES)

    model = DiffusionUNet(
        in_channels=96, out_ch=3, ch=CH, ch_mult=CH_MULT,
        num_res_blocks=NUM_RES, attn_resolutions=ATTN, dropout=0.0,
        resolution=64)
    # shape-only init (no 625MB of random weights materialised)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 96)), jnp.zeros((1,)))["params"]
    assert _tree_shapes(params) == _tree_shapes(shapes)
    n_conv = sum(int(np.prod(v.shape))
                 for v in jax.tree_util.tree_leaves(params))
    assert n_conv == UNET_PARAMS_EXPECTED

    # forward parity at the shipped eval patch geometry (1, 64, 64, 96)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 96, 64, 64)).astype(np.float32)
    t = np.array([500.0], dtype=np.float32)
    with torch.no_grad():
        ref = unet(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-2)
    assert np.abs(out - ref).mean() < 2e-4


def test_full_size_ema_import(reference_ckpt):
    """--ema must pull the ema_helper shadow, not state_dict."""
    sd = load_torch_checkpoint(reference_ckpt)
    ema = load_torch_checkpoint(reference_ckpt, ema=True)
    assert set(ema) == set(sd)
    k = next(iter(sd))
    np.testing.assert_allclose(ema[k], sd[k] + 1e-3, atol=1e-6)
    # and it converts cleanly too
    params = convert_unet_state_dict(
        ema, num_levels=len(CH_MULT), num_res_blocks=NUM_RES)
    assert sum(int(np.prod(v.shape))
               for v in jax.tree_util.tree_leaves(params)) == UNET_PARAMS_EXPECTED


def test_full_size_hfrm_conversion_and_parity(reference_models):
    _, hfrm = reference_models
    n_ref = sum(p.numel() for p in hfrm.parameters())
    assert n_ref == HFRM_PARAMS_EXPECTED

    sd = {k: v.detach().numpy() for k, v in hfrm.state_dict().items()}
    params = convert_hfrm_state_dict(
        sd, enc_blk_nums=(2, 2, 2, 4), mid_blk_num=6,
        dec_blk_nums=(2, 2, 2, 2))
    model = HFRM(dim=32, enc_blk_nums=(2, 2, 2, 4), mid_blk_num=6,
                 dec_blk_nums=(2, 2, 2, 2))
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 480, 720, 3)))["params"]
    assert _tree_shapes(params) == _tree_shapes(shapes)
    assert sum(int(np.prod(v.shape))
               for v in jax.tree_util.tree_leaves(params)) == HFRM_PARAMS_EXPECTED

    # forward parity at the full RainDrop eval geometry 720x480
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (1, 3, 480, 720)).astype(np.float32)
    with torch.no_grad():
        ref = hfrm(torch.from_numpy(x)).numpy()
    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-2)
    assert np.abs(out - ref).mean() < 2e-4
