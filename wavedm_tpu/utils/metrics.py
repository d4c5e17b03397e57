"""Image quality metrics: PSNR (4 reference-equivalent variants), SSIM
(MATLAB-equivalent), BT.601 Y-channel conversions.

Reproduces the reference's metric surface (utils/metrics.py:7-255) so scores
are comparable bit-for-bit:

- ``psnr_torch``: clamp to [0,1], RMSE over the whole batch, 20*log10(1/rmse)
  (reference torchPSNR, utils/metrics.py:7-11).
- ``psnr_np``: [0,255] float64 images, optional Y-channel, 20*log10(255/rmse)
  (reference calculate_psnr, utils/metrics.py:53-79).
- ``psnr_y``: [0,1] images, Y-channel via the BT.601 dot product, mean MSE
  (reference calculate_psnr_in_GPU, utils/metrics.py:43-51).
- ``ssim``: 11x11 Gaussian window sigma 1.5, 5-pixel crop, per-channel mean
  (reference calculate_ssim/_ssim, utils/metrics.py:82-149).

Note the reference feeds RGB images into its ``bgr2ycbcr`` helpers, so the
effective luma is 24.966*R + 128.553*G + 65.481*B; we reproduce that exactly
(flagged in the docstrings) rather than "fixing" it, since it changes reported
PSNR.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

Array = np.ndarray

# BT.601 (as applied by the reference to RGB-ordered data)
_Y_COEF_RGB_AS_BGR = np.array([24.966, 128.553, 65.481], dtype=np.float64)
_YCBCR_MAT = np.array(
    [[24.966, 112.0, -18.214],
     [128.553, -74.203, -93.786],
     [65.481, -37.797, 112.0]], dtype=np.float64)
_YCBCR_OFF = np.array([16.0, 128.0, 128.0], dtype=np.float64)


def psnr_torch(target: Array, pred: Array) -> float:
    """Whole-batch PSNR on [0,1] data (reference torchPSNR)."""
    diff = np.clip(pred, 0, 1).astype(np.float64) - np.clip(target, 0, 1).astype(np.float64)
    rmse = np.sqrt((diff ** 2).mean())
    return float(20.0 * np.log10(1.0 / rmse))


def batch_psnr(target: Array, pred: Array) -> Array:
    """Per-image PSNR on [0,1] NHWC batches (reference BatchPSNR,
    train_hfrm.py:27-31)."""
    diff = np.clip(pred, 0, 1).astype(np.float64) - np.clip(target, 0, 1).astype(np.float64)
    rmse = np.sqrt((diff ** 2).mean(axis=(1, 2, 3)))
    return 20.0 * np.log10(1.0 / rmse)


def rgb_to_y_reference(img: Array) -> Array:
    """Y channel the way the reference computes it for RGB inputs passed to
    its bgr-named helpers ([0,1] float in, [0,255]-scale Y out then /255 or
    kept; here: [0,1]-ranged Y)."""
    y = img.astype(np.float64) @ _Y_COEF_RGB_AS_BGR + 16.0
    return y / 255.0


def psnr_y(target: Array, pred: Array) -> float:
    """[0,1] HWC (or NHWC) images -> Y-channel PSNR
    (reference calculate_psnr_in_GPU with test_y_channel=True)."""
    ty = rgb_to_y_reference(target)
    py = rgb_to_y_reference(pred)
    mse = ((ty - py) ** 2).mean()
    return float(20.0 * np.log10(1.0 / np.sqrt(mse)))


def bgr2ycbcr(img: Array, y_only: bool = False) -> Array:
    """BT.601 'BGR' -> YCbCr on [0,1]-or-uint8 input, matching the reference
    (utils/metrics.py:225-255) including its type/range conventions."""
    img_type = img.dtype
    x = img.astype(np.float64)
    if img_type == np.uint8:
        x = x / 255.0
    if y_only:
        out = x @ _Y_COEF_RGB_AS_BGR + 16.0
    else:
        out = x @ _YCBCR_MAT + _YCBCR_OFF
    if img_type == np.uint8:
        out = out.round().astype(np.uint8)
    else:
        out = (out / 255.0).astype(np.float32)
    return out


def to_y_channel(img: Array) -> Array:
    """[0,255] image -> [0,255] float Y channel (reference to_y_channel)."""
    x = img.astype(np.float32) / 255.0
    if x.ndim == 3 and x.shape[2] == 3:
        x = bgr2ycbcr(x, y_only=True)
        x = x[..., None]
    return x * 255.0


def psnr_np(img1: Array, img2: Array, test_y_channel: bool = False) -> float:
    """[0,255] HWC images -> PSNR (reference calculate_psnr)."""
    assert img1.shape == img2.shape
    a = img1.astype(np.float64)
    b = img2.astype(np.float64)
    if test_y_channel:
        a = to_y_channel(a)
        b = to_y_channel(b)
    mse = ((a - b) ** 2).mean()
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0 / np.sqrt(mse)))


def _gaussian_window() -> Array:
    if cv2 is not None:
        k = cv2.getGaussianKernel(11, 1.5)
        return np.outer(k, k.T)
    # cv2-equivalent kernel
    xs = np.arange(11) - 5
    k = np.exp(-(xs ** 2) / (2 * 1.5 ** 2))
    k = (k / k.sum())[:, None]
    return np.outer(k, k.T)


def _filter2_valid_center(img: Array, window: Array) -> Array:
    """cv2.filter2D(..., borderType=default)[5:-5, 5:-5] equivalent: a full
    'same' correlation then crop -- interior values don't touch the border."""
    if cv2 is not None:
        return cv2.filter2D(img, -1, window)[5:-5, 5:-5]
    from numpy.lib.stride_tricks import sliding_window_view
    win = sliding_window_view(img, (11, 11))
    return (win * window).sum(axis=(-1, -2))


def _ssim_single(img1: Array, img2: Array) -> float:
    """One-channel SSIM on [0,255] data (reference _ssim,
    utils/metrics.py:82-113)."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    window = _gaussian_window()
    mu1 = _filter2_valid_center(img1, window)
    mu2 = _filter2_valid_center(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _filter2_valid_center(img1 ** 2, window) - mu1_sq
    sigma2_sq = _filter2_valid_center(img2 ** 2, window) - mu2_sq
    sigma12 = _filter2_valid_center(img1 * img2, window) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return float(ssim_map.mean())


def ssim(img1: Array, img2: Array, test_y_channel: bool = False) -> float:
    """[0,255] HWC images -> mean per-channel SSIM (reference calculate_ssim)."""
    assert img1.shape == img2.shape
    a = img1.astype(np.float64)
    b = img2.astype(np.float64)
    if test_y_channel:
        a = to_y_channel(a)
        b = to_y_channel(b)
    return float(np.mean([_ssim_single(a[..., i], b[..., i])
                          for i in range(a.shape[2])]))
