"""Paired input/gt folder dataset (HFRM stage-1 pipeline).

Equivalent of the reference ``myImageFloder``/``default_loader``
(datasets/dataset.py:13-132): sorted input/ and gt/ listings, optional shared
random crop, optional bilinear resize, and the RainDrop 720x480 enforcement
when neither crop nor resize is active.  The reference's flip/rot augmentation
code paths are permanently disabled there (r=0/t=0, datasets/dataset.py:40-54)
and therefore not reproduced.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


class PairedImageFolder:
    def __init__(self, root: str, crop: bool = True, resize: bool = True,
                 crop_size: int = 480, resize_size: int = 256,
                 process_index: int = 0, process_count: int = 1):
        if Image is None:
            raise RuntimeError("PIL is required")
        self.root = root
        self.crop = crop
        self.resize = resize
        self.crop_size = crop_size
        self.resize_size = resize_size
        inp_dir = os.path.join(root, "input")
        gt_dir = os.path.join(root, "gt")
        self.inputs = sorted(
            os.path.join(inp_dir, f) for f in os.listdir(inp_dir)
            if f not in (".", ".."))
        self.gts = sorted(
            os.path.join(gt_dir, f) for f in os.listdir(gt_dir)
            if f not in (".", ".."))
        assert len(self.inputs) == len(self.gts), "input/gt count mismatch"
        self.indices = list(range(process_index, len(self.inputs), process_count))

    def __len__(self) -> int:
        return len(self.indices)

    def load_pair(self, idx: int,
                  rng: Optional[np.random.Generator] = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
        if not self.crop and not self.resize:
            # full-image path (the raindrop stage-1 protocol): native C++
            # decode when built (16 ms vs 356 ms PIL); the 720x480
            # enforcement below only bites on non-canonical sources, which
            # fall back to PIL for resample parity
            from wavedm_tpu.data import native_loader
            if native_loader.available():
                a = native_loader.decode_image(self.inputs[idx])
                b = native_loader.decode_image(self.gts[idx])
                if ("raindrop" not in self.root
                        or (a.shape[:2] == (480, 720)
                            and b.shape[:2] == (480, 720))):
                    return a, b
        img1 = Image.open(self.inputs[idx]).convert("RGB")
        img2 = Image.open(self.gts[idx]).convert("RGB")
        w, h = img1.size
        if self.crop:
            rng = rng or np.random.default_rng()
            cs = self.crop_size
            x = int(rng.integers(0, max(1, w - cs + 1)))
            y = int(rng.integers(0, max(1, h - cs + 1)))
            box = (x, y, x + cs, y + cs)
            img1, img2 = img1.crop(box), img2.crop(box)
        if self.resize:
            rs = (self.resize_size, self.resize_size)
            img1 = img1.resize(rs, Image.BILINEAR)
            img2 = img2.resize(rs, Image.BILINEAR)
        if "raindrop" in self.root and not self.crop and not self.resize:
            if img1.size != (720, 480):
                img1 = img1.resize((720, 480), Image.BILINEAR)
                img2 = img2.resize((720, 480), Image.BILINEAR)
        a = np.asarray(img1, np.float32) / 255.0
        b = np.asarray(img2, np.float32) / 255.0
        return a, b

    def batches(self, batch_size: int, epoch: int, seed: int,
                shuffle: bool = True) -> Iterator[np.ndarray]:
        """(B, H, W, 6) [cond|gt] batches for one epoch."""
        order = np.array(self.indices)
        if shuffle:
            np.random.default_rng(seed + epoch).shuffle(order)
        buf = []
        for idx in order:
            rng = np.random.default_rng((seed, epoch, int(idx)))
            a, b = self.load_pair(int(idx), rng)
            buf.append(np.concatenate([a, b], axis=-1))
            if len(buf) == batch_size:
                yield np.stack(buf)
                buf = []
