"""Image I/O helpers (reference utils/logging.py:11-14 save_image and the
grid dumps at models/ddm_wavelet.py:399-409)."""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[0,1] float HWC -> uint8."""
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_image(img: np.ndarray, path: str) -> None:
    """Save an HWC [0,1] float (or uint8) image, creating directories."""
    if Image is None:
        raise RuntimeError("PIL is required for image saving")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = img if img.dtype == np.uint8 else to_uint8(img)
    Image.fromarray(arr).save(path)


def make_grid(images: Sequence[np.ndarray], nrow: int = 4,
              pad: int = 2) -> np.ndarray:
    """Tile HWC [0,1] images into a grid (reference uses torchvision
    make_grid, models/ddm_wavelet.py:406-409)."""
    n = len(images)
    h, w, c = images[0].shape
    ncol = nrow
    nr = (n + ncol - 1) // ncol
    grid = np.zeros((nr * (h + pad) + pad, ncol * (w + pad) + pad, c),
                    dtype=np.float32)
    for k, im in enumerate(images):
        r, cl = divmod(k, ncol)
        y = pad + r * (h + pad)
        x = pad + cl * (w + pad)
        grid[y:y + h, x:x + w] = im
    return grid
