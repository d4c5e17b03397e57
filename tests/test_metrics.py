"""Metric parity tests: recompute the reference formulas independently
(numpy/cv2/torch) and compare."""

import numpy as np
import pytest

from wavedm_tpu.utils import metrics as M


@pytest.fixture()
def imgs(rng):
    a = rng.random((24, 32, 3)).astype(np.float32)
    b = np.clip(a + 0.05 * rng.standard_normal((24, 32, 3)).astype(np.float32), 0, 1)
    return a, b


def test_psnr_torch_matches_torch(imgs):
    import torch
    a, b = imgs
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    imdff = torch.clamp(tb, 0, 1) - torch.clamp(ta, 0, 1)
    ref = float(20 * torch.log10(1 / (imdff ** 2).mean().sqrt()))
    assert M.psnr_torch(a, b) == pytest.approx(ref, rel=1e-5)


def test_psnr_y_matches_reference_formula(imgs):
    a, b = imgs
    coef = np.array([24.966, 128.553, 65.481])
    ya = ((a * coef[None, None]).sum(-1) + 16.0) / 255.0
    yb = ((b * coef[None, None]).sum(-1) + 16.0) / 255.0
    ref = 20 * np.log10(1 / np.sqrt(((ya - yb) ** 2).mean()))
    assert M.psnr_y(a, b) == pytest.approx(float(ref), rel=1e-6)


def test_psnr_np_identity_inf(imgs):
    a, _ = imgs
    assert M.psnr_np(a * 255, a * 255) == float("inf")


def test_psnr_np_y_channel(imgs):
    a, b = imgs
    v = M.psnr_np(a * 255, b * 255, test_y_channel=True)
    # Y-channel PSNR should be higher than RGB PSNR for uncorrelated noise
    assert v > M.psnr_np(a * 255, b * 255) - 1.0
    assert np.isfinite(v)


def test_ssim_range_and_identity(imgs):
    a, b = imgs
    assert M.ssim(a * 255, a * 255) == pytest.approx(1.0, abs=1e-9)
    v = M.ssim(a * 255, b * 255)
    assert 0.0 < v < 1.0


def test_ssim_matches_cv2_reference_impl(imgs):
    """Recompute the reference _ssim (utils/metrics.py:82-113) inline with
    cv2 and compare channel 0."""
    cv2 = pytest.importorskip("cv2")
    a, b = imgs
    img1 = (a[..., 0] * 255).astype(np.float64)
    img2 = (b[..., 0] * 255).astype(np.float64)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.T)
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    s1 = cv2.filter2D(img1 ** 2, -1, window)[5:-5, 5:-5] - mu1 ** 2
    s2 = cv2.filter2D(img2 ** 2, -1, window)[5:-5, 5:-5] - mu2 ** 2
    s12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1 * mu2
    ref = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
           / ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))).mean()
    ours = M._ssim_single(img1, img2)
    assert ours == pytest.approx(float(ref), rel=1e-9)


def test_batch_psnr_shape(imgs):
    a, b = imgs
    v = M.batch_psnr(a[None], b[None])
    assert v.shape == (1,)
    assert v[0] == pytest.approx(M.psnr_torch(a, b), rel=1e-6)


def test_bgr2ycbcr_uint8_roundtrip_types(imgs):
    a, _ = imgs
    u8 = (a * 255).astype(np.uint8)
    y = M.bgr2ycbcr(u8, y_only=True)
    assert y.dtype == np.uint8
    yf = M.bgr2ycbcr(a, y_only=True)
    assert yf.dtype == np.float32
