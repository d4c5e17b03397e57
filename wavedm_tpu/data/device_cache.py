"""Device-resident dataset cache: the decoded training split lives in HBM
(uint8) and per-step crop batches are pure on-device gathers driven by a
~100-byte host->device index transfer.

Why (two-fold):

1. TPU-native throughput: RainDrop's whole train split fits comfortably in
   HBM as uint8 (861 pairs x 720x480x6 bytes ~ 1.8 GB of a v5e's 16 GB), so
   after a one-time decode+upload the input pipeline does no per-step host
   decode, no per-step host->device image transfer, and the crop gather
   overlaps with the train step under XLA's async dispatch.

2. Harness robustness: on relay-attached dev hosts EVERY host->device
   transfer's staging buffer is pinned for the process lifetime (measured:
   100% of transferred bytes retained; ``jax.clear_caches()`` does not
   release them), so streaming ~12 MB crop batches leaks that much host RAM
   per step.  With the cache the per-step transfer is the (B, 3) int32
   coordinate array.

Crop-coordinate RNG reproduces the PIL pipeline exactly (per-(seed, epoch,
image-index) generator, ys then xs -- data/raindrop.py) so cached and
streamed training see identical batches.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


class DeviceCropCache:
    """(N, H, W, 6) uint8 [cond|gt] pairs resident on device; batched random
    crops as one jitted gather returning (B, P, P, 6) float32 in [0, 1]."""

    def __init__(self, pairs_uint8: np.ndarray, patch_size: int,
                 device=None):
        import jax
        import jax.numpy as jnp

        assert pairs_uint8.dtype == np.uint8 and pairs_uint8.ndim == 4
        self.n, self.h, self.w, self.c = pairs_uint8.shape
        self.patch_size = int(patch_size)
        self.data = jax.device_put(pairs_uint8, device)  # ONE transfer
        p, ch = self.patch_size, self.c

        @jax.jit
        def crop(data, coords):
            def one(cd):
                sl = jax.lax.dynamic_slice(
                    data, (cd[0], cd[1], cd[2], 0), (1, p, p, ch))
                return sl[0]
            out = jax.vmap(one)(coords)
            return out.astype(jnp.float32) / 255.0

        self._crop = crop

    def crop_batch(self, coords: np.ndarray):
        """coords: (B, 3) int32 rows [image_idx, y, x] -> (B, P, P, 6) f32
        device array."""
        import jax.numpy as jnp
        return self._crop(self.data, jnp.asarray(coords, jnp.int32))

    def draw_coords(self, order: Sequence[int], seed: int, epoch: int,
                    patch_n: int) -> Iterator[np.ndarray]:
        """Per-image coordinate batches matching the PIL path's RNG
        (data/raindrop.py: per-(seed, epoch, idx) generator, ys then xs)."""
        p = self.patch_size
        for idx in order:
            rng = np.random.default_rng((seed, epoch, int(idx)))
            ys = rng.integers(0, max(1, self.h - p + 1), patch_n)
            xs = rng.integers(0, max(1, self.w - p + 1), patch_n)
            yield np.stack([np.full(patch_n, idx), ys, xs],
                           axis=1).astype(np.int32)


def build_pair_cache(input_paths: List[str], gt_paths: List[str],
                     patch_size: int,
                     use_native: Optional[bool] = None) -> DeviceCropCache:
    """Decode all pairs once (native C++ decoder when built, PIL otherwise)
    and upload as a single uint8 tensor."""
    from wavedm_tpu.data import native_loader

    if use_native is None:
        use_native = native_loader.available()
    pairs = []
    for pi, pg in zip(input_paths, gt_paths):
        if use_native:
            a = native_loader.decode_image(pi)
            b = native_loader.decode_image(pg)
            pair = np.concatenate([a, b], axis=-1)
            pair = np.clip(pair * 255.0 + 0.5, 0, 255).astype(np.uint8)
        else:
            from PIL import Image
            a = np.asarray(Image.open(pi).convert("RGB"), np.uint8)
            b = np.asarray(Image.open(pg).convert("RGB"), np.uint8)
            pair = np.concatenate([a, b], axis=-1)
        pairs.append(pair)
    shapes = {p.shape for p in pairs}
    if len(shapes) > 1:
        from wavedm_tpu.config import ConfigError
        raise ConfigError(
            "data.device_cache requires a uniform train-image geometry "
            f"(one HBM-resident (N,H,W,6) tensor); got sizes {sorted(shapes)}."
            " Use the streaming PIL/native pipeline (device_cache: false) "
            "for mixed-size splits.")
    return DeviceCropCache(np.stack(pairs), patch_size)
