"""End-to-end chain parity against the RUNNING reference implementation.

The strongest "same math" proof available in this environment: build BOTH
stacks from ONE set of weights (reference torch modules randomly initialised,
converted to Flax via utils/torch_compat), feed them identical conditioning
and an identical x_T, then run

  reference: DenoisingDiffusion_Wavelet.generalized_steps_overlapping
             (models/ddm_wavelet.py:437-506) + the x0_preds[-5] selection and
             HF-band recombination of models/restoration.py:106-131
  repo:      wavedm_tpu.diffusion.sampling.make_overlapping_sampler with
             x0_keep=-5 + the same recombination via ops.wavelet

at reduced geometry (64x96 pixels -> 16x24 wavelet domain, 15 overlapping
8x8 patches, 10 DDIM steps) and assert the final recombined [0,1] images
agree to float32 round-off accumulation (<=2e-3 absolute).

The reference code is IMPORTED from /root/reference (the make_goldens
pattern), never copied; torchvision's ``crop`` -- absent here -- is stood in
by an equivalent slice (crop(img, top, left, h, w) == img[..., t:t+h, l:l+w],
the documented torchvision semantics).
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

from wavedm_tpu.diffusion.sampling import (  # noqa: E402
    make_overlapping_sampler,
    overlapping_grid_corners,
)
from wavedm_tpu.diffusion.schedules import get_beta_schedule  # noqa: E402
from wavedm_tpu.models.hfrm import HFRM  # noqa: E402
from wavedm_tpu.models.unet import DiffusionUNet  # noqa: E402
from wavedm_tpu.ops.wavelet import wavelet_dec, wavelet_rec  # noqa: E402
from wavedm_tpu.utils.torch_compat import (  # noqa: E402

    convert_hfrm_state_dict,
    convert_unet_state_dict,
)

# reduced flagship geometry: pixel 64x96 -> 2-level wavelet domain 16x24,
# 8x8 patches at stride 4 -> 15 overlapping tiles; 10-step DDIM over T=50
H, W = 64, 96
HW, WW = H // 4, W // 4
P, GRID_R = 8, 4
T, N_STEPS = 50, 10
SEQ = list(range(0, T, T // N_STEPS))
BETA_START, BETA_END = 1e-4, 2e-2
X0_PRED_INDEX = -5  # reference models/restoration.py:108


def _real_crop(img, top, left, h, w):
    """torchvision.transforms.functional.crop semantics (the library is not
    installed here; make_goldens stubs it with a no-op, which would break the
    reference's manual patch batching)."""
    return img[..., top:top + h, left:left + w]


@pytest.fixture(scope="module")
def stacks():
    from make_goldens import _install_reference_pkg, _ns

    cwd = os.getcwd()
    _install_reference_pkg()
    # the chain test needs a WORKING crop before the reference modules bind it
    sys.modules["torchvision.transforms.functional"].crop = _real_crop
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    try:
        from models.arch import HFRM as RefHFRM
        from models.ddm_wavelet import DenoisingDiffusion_Wavelet
        from models.unet import DiffusionUNet as RefUNet
        from models.wavelet import WaveletTransform

        config = _ns(
            data=_ns(use_window=False, window_size=2, wavelet_in_unet=False,
                     image_size=P, conditional=True, begin_from_noise=True),
            model=_ns(ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
                      attn_resolutions=[4], dropout=0.0, in_channels=48,
                      pred_channels=3, use_other_channels=True,
                      other_channels_begin=3, resamp_with_conv=True),
        )
        torch.manual_seed(0)
        ref_unet = RefUNet(config).eval()
        torch.manual_seed(1)
        ref_hfrm = RefHFRM(in_channel=3, dim=8, mid_blk_num=1,
                           enc_blk_nums=[1, 1], dec_blk_nums=[1, 1]).eval()
        pkl = os.path.join(REFERENCE, "models", "wavelet_weights_c2.pkl")
        dwt = WaveletTransform(scale=2, dec=True, params_path=pkl).eval()
        iwt = WaveletTransform(scale=2, dec=False, params_path=pkl).eval()
        yield config, ref_unet, ref_hfrm, dwt, iwt, DenoisingDiffusion_Wavelet
    finally:
        os.chdir(cwd)


def _reference_chain(stacks, cond01_nchw, x_t_nchw, betas_np):
    """The reference restoration chain exactly as models/restoration.py
    drives it for the wavelet path (lines 63-131), on torch CPU."""
    config, ref_unet, ref_hfrm, dwt, iwt, RefDDM = stacks
    with torch.no_grad():
        cond01 = torch.from_numpy(cond01_nchw)
        x_cond = dwt(2 * cond01 - 1.0)                       # (1, 48, HW, WW)
        hfrm_out = ref_hfrm(cond01)                          # [0,1] domain
        hfrm_wav = dwt(2 * hfrm_out - 1.0)
        x_other = hfrm_wav[:, 3:, :, :]

        h_list = list(range(0, HW - P + 1, GRID_R))
        w_list = list(range(0, WW - P + 1, GRID_R))
        if h_list[-1] + P < HW:
            h_list.append(HW - P)
        if w_list[-1] + P < WW:
            w_list.append(WW - P)
        corners = [(i, j) for i in h_list for j in w_list]

        dummy = types.SimpleNamespace(config=config)         # begin_from_noise
        xs, x0_preds = RefDDM.generalized_steps_overlapping(
            dummy, torch.from_numpy(x_t_nchw), x_cond, SEQ, ref_unet,
            torch.from_numpy(betas_np), eta=0.0, corners=corners, p_size=P,
            manual_batching=True, x_other=x_other, use_other=True)
        x_output = x0_preds[X0_PRED_INDEX]
        full = torch.cat([x_output, hfrm_wav[:, 3:, :, :]], dim=1)
        out = torch.clamp((iwt(full) + 1.0) / 2.0, 0.0, 1.0)
        return (np.asarray(out), np.asarray(x_output),
                np.asarray(hfrm_out), np.asarray(x_cond))


def _repo_chain(stacks, cond01_nchw, x_t_nchw, betas_np):
    """The same chain through the repo's tiled sampler + wavelet ops,
    mirroring inference/restoration.py:_build_wavelet_restore with the x_T
    injected instead of drawn."""
    _, ref_unet, ref_hfrm, _, _, _ = stacks
    unet = DiffusionUNet(in_channels=96, out_ch=3, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, attn_resolutions=(4,), dropout=0.0,
                         resolution=P)
    uparams = convert_unet_state_dict(
        {k: v.numpy() for k, v in ref_unet.state_dict().items()},
        num_levels=2, num_res_blocks=1)
    hfrm = HFRM(in_channel=3, dim=8, mid_blk_num=1,
                enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
    hparams = convert_hfrm_state_dict(
        {k: v.numpy() for k, v in ref_hfrm.state_dict().items()},
        enc_blk_nums=(1, 1), mid_blk_num=1, dec_blk_nums=(1, 1))
    uparams = jax.tree_util.tree_map(jnp.asarray, uparams)
    hparams = jax.tree_util.tree_map(jnp.asarray, hparams)

    cond01 = jnp.asarray(cond01_nchw.transpose(0, 2, 3, 1))
    cond_w = wavelet_dec(2.0 * cond01 - 1.0)
    hfrm_out = hfrm.apply({"params": hparams}, cond01)
    hfrm_w = wavelet_dec(2.0 * hfrm_out - 1.0)
    x_other = hfrm_w[..., 3:]

    sampler = make_overlapping_sampler(
        lambda params, x, t: unet.apply({"params": params}, x, t),
        image_shape=(HW, WW), patch_size=P, grid_r=GRID_R,
        seq=np.asarray(SEQ), betas=jnp.asarray(betas_np),
        pred_channels=3, eta=0.0, use_other=True, x0_keep=X0_PRED_INDEX)
    x_t = jnp.asarray(x_t_nchw.transpose(0, 2, 3, 1))
    _, x0_kept = sampler(x_t, cond_w, x_other, jax.random.PRNGKey(0),
                         params=uparams)
    sel = x0_kept[0]
    full = jnp.concatenate([sel, hfrm_w[..., 3:]], axis=-1)
    out = jnp.clip((wavelet_rec(full) + 1.0) / 2.0, 0.0, 1.0)
    to_nchw = lambda a: np.asarray(a).transpose(0, 3, 1, 2)
    return (to_nchw(out), to_nchw(sel), to_nchw(hfrm_out), to_nchw(cond_w))


def test_reference_chain_parity(stacks):
    rng = np.random.default_rng(7)
    cond01 = rng.uniform(0.1, 0.9, (1, 3, H, W)).astype(np.float32)
    x_t = rng.standard_normal((1, 3, HW, WW)).astype(np.float32)
    betas = get_beta_schedule("linear", beta_start=BETA_START,
                              beta_end=BETA_END,
                              num_diffusion_timesteps=T).astype(np.float32)

    ref_out, ref_ll, ref_hfrm_out, ref_cond_w = _reference_chain(
        stacks, cond01, x_t, betas)
    got_out, got_ll, got_hfrm_out, got_cond_w = _repo_chain(
        stacks, cond01, x_t, betas)

    # stage-by-stage: DWT bank, frozen stage-1, diffusion-chain x0, recombined
    np.testing.assert_allclose(got_cond_w, ref_cond_w, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(got_hfrm_out, ref_hfrm_out, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(got_ll, ref_ll, atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(got_out, ref_out, atol=2e-3, rtol=1e-2)
    assert np.abs(got_out - ref_out).mean() < 2e-4
