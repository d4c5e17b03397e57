"""Generate golden parity fixtures from the reference implementation.

Runs the reference PyTorch models (imported from /root/reference, never
copied) on fixed random inputs with small configs, and stores
input/output/state_dict triples as npz under tests/golden/.  Committed
fixtures let the test suite verify numerical parity without needing the
reference tree or torch at test time.

Usage:  python tools/make_goldens.py
"""

import argparse
import os
import sys
import types

import numpy as np

REFERENCE = os.environ.get("WAVEDM_REFERENCE", "/root/reference")
OUT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "tests", "golden"))


def _install_reference_pkg():
    """Make `models.unet` / `models.arch` importable from the reference tree
    WITHOUT executing models/__init__.py (which drags in torchvision/cv2
    that are absent here): register a synthetic namespace package."""
    if "models" in sys.modules:
        return
    pkg = types.ModuleType("models")
    pkg.__path__ = [os.path.join(REFERENCE, "models")]
    sys.modules["models"] = pkg
    # stub absent optional deps pulled in by reference utils/__init__
    for name in ("skimage", "skimage.color", "torchvision", "torchvision.utils",
                 "torchvision.transforms", "torchvision.transforms.functional"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["skimage"].color = sys.modules["skimage.color"]
    sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision.transforms"].functional = sys.modules[
        "torchvision.transforms.functional"]
    sys.modules["torchvision.utils"].save_image = lambda *a, **k: None
    sys.modules["torchvision.utils"].make_grid = lambda *a, **k: None
    sys.modules["torchvision.transforms.functional"].crop = lambda *a, **k: None
    os.chdir(REFERENCE)  # WaveletTransform loads ./models/wavelet_weights_c2.pkl


def _ns(**kw):
    n = types.SimpleNamespace()
    for k, v in kw.items():
        setattr(n, k, v)
    return n


def make_unet_golden(torch):
    _install_reference_pkg()
    from models.unet import DiffusionUNet  # reference module

    config = _ns(
        data=_ns(use_window=False, window_size=2, wavelet_in_unet=False,
                 image_size=16, conditional=True),
        model=_ns(ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
                  attn_resolutions=[8], dropout=0.0, in_channels=3,
                  pred_channels=3, use_other_channels=False,
                  other_channels_begin=0, resamp_with_conv=True),
    )
    torch.manual_seed(0)
    net = DiffusionUNet(config).eval()
    x = torch.randn(2, 6, 16, 16)
    t = torch.tensor([3.0, 700.0])
    with torch.no_grad():
        y = net(x, t)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez_compressed(
        os.path.join(OUT, "unet_small.npz"),
        x=x.numpy(), t=t.numpy(), y=y.numpy(),
        **{f"sd::{k}": v for k, v in sd.items()},
    )
    print("unet_small: out", tuple(y.shape),
          "params", sum(v.size for v in sd.values()))


def make_unet_window_golden(torch):
    """Window-mode variant (use_window=True): exercises the space-to-depth
    reshuffle (reference models/unet.py:309-336)."""
    _install_reference_pkg()
    from models.unet import DiffusionUNet

    # window p=2 on 32x32 input -> 16x16 working res, channels x4
    config = _ns(
        data=_ns(use_window=True, window_size=2, wavelet_in_unet=False,
                 image_size=16, conditional=True),
        model=_ns(ch=32, out_ch=24, ch_mult=[1, 2], num_res_blocks=1,
                  attn_resolutions=[], dropout=0.0, in_channels=12,
                  pred_channels=12, use_other_channels=False,
                  other_channels_begin=0, resamp_with_conv=True),
    )
    torch.manual_seed(1)
    net = DiffusionUNet(config).eval()
    x = torch.randn(1, 6, 32, 32)
    t = torch.tensor([11.0])
    with torch.no_grad():
        y = net(x, t)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez_compressed(
        os.path.join(OUT, "unet_window.npz"),
        x=x.numpy(), t=t.numpy(), y=y.numpy(),
        **{f"sd::{k}": v for k, v in sd.items()},
    )
    print("unet_window: out", tuple(y.shape))


def make_hfrm_golden(torch):
    _install_reference_pkg()
    from models.arch import HFRM

    torch.manual_seed(2)
    net = HFRM(in_channel=3, dim=8, mid_blk_num=1,
               enc_blk_nums=[1, 1], dec_blk_nums=[1, 1]).eval()
    x = torch.randn(1, 3, 16, 16)
    with torch.no_grad():
        y = net(x)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez_compressed(
        os.path.join(OUT, "hfrm_small.npz"),
        x=x.numpy(), y=y.numpy(),
        **{f"sd::{k}": v for k, v in sd.items()},
    )
    print("hfrm_small: out", tuple(y.shape),
          "params", sum(v.size for v in sd.values()))


def make_param_count_golden(torch):
    """Full-size model parameter counts (the reference prints these at init:
    models/ddm_wavelet.py:154, train_hfrm.py:155-156)."""
    _install_reference_pkg()
    from models.unet import DiffusionUNet
    from models.arch import HFRM

    config = _ns(
        data=_ns(use_window=False, window_size=2, wavelet_in_unet=False,
                 image_size=64, conditional=True),
        model=_ns(ch=128, out_ch=3, ch_mult=[1, 2, 4, 6], num_res_blocks=2,
                  attn_resolutions=[16], dropout=0.0, in_channels=48,
                  pred_channels=3, use_other_channels=True,
                  other_channels_begin=3, resamp_with_conv=True),
    )
    unet = DiffusionUNet(config)
    n_unet = sum(p.numel() for p in unet.parameters())
    hfrm = HFRM(in_channel=3, dim=32, mid_blk_num=6,
                enc_blk_nums=[2, 2, 2, 4], dec_blk_nums=[2, 2, 2, 2])
    n_hfrm = sum(p.numel() for p in hfrm.parameters())
    np.savez(os.path.join(OUT, "param_counts.npz"),
             unet=np.int64(n_unet), hfrm=np.int64(n_hfrm))
    print(f"param counts: unet={n_unet} ({n_unet/1e6:.2f}M) "
          f"hfrm={n_hfrm} ({n_hfrm/1e6:.2f}M)")


def make_sam_golden(torch):
    """8-direction IRNN SAM (models/sam.py:150-210)."""
    _install_reference_pkg()
    from models.sam import SAM

    torch.manual_seed(3)
    net = SAM(in_channels=64, out_channels=16).eval()
    x = torch.randn(1, 64, 8, 10)
    with torch.no_grad():
        y = net(x)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez_compressed(
        os.path.join(OUT, "sam_small.npz"),
        x=x.numpy(), y=y.numpy(),
        **{f"sd::{k}": v for k, v in sd.items()},
    )
    print("sam_small: out", tuple(y.shape))


def make_lap_golden(torch):
    """Fixed Gaussian Laplacian pyramid decom/recons (models/Lap.py:6-64)."""
    _install_reference_pkg()
    from models.Lap import Lap_Pyramid_Conv

    torch.manual_seed(4)
    lap = Lap_Pyramid_Conv(num_high=3, channels=6)
    x = torch.randn(1, 6, 40, 56)
    with torch.no_grad():
        pyr = lap.pyramid_decom(x)
        rec = lap.pyramid_recons(pyr)
    np.savez_compressed(
        os.path.join(OUT, "lap_small.npz"),
        x=x.numpy(), rec=rec.numpy(),
        **{f"pyr{i}": p.numpy() for i, p in enumerate(pyr)},
    )
    print("lap_small: levels", [tuple(p.shape) for p in pyr])


def main():
    os.makedirs(OUT, exist_ok=True)
    import torch
    torch.set_num_threads(1)
    make_unet_golden(torch)
    make_unet_window_golden(torch)
    make_hfrm_golden(torch)
    make_param_count_golden(torch)
    make_sam_golden(torch)
    make_lap_golden(torch)


if __name__ == "__main__":
    main()
