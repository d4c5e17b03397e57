"""ctypes bindings for the native C++ data loader (libwavedm_data.so).

The native library (native/dataloader/wavedm_data.cc) does JPEG/PNG decode and
random-crop batch assembly with a thread pool, producing the exact
(batch*patch_n, P, P, 6) float32 tensor the jitted train step consumes.
Falls back to the PIL pipeline (wavedm_tpu.data.raindrop) when the library
isn't built; build with ``make -C native/dataloader``.
"""

from __future__ import annotations

import ctypes
import os
from typing import Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libwavedm_data.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        raise RuntimeError(
            f"native loader not built ({_LIB_PATH}); run "
            "`make -C native/dataloader`")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.wdm_decode_image.restype = ctypes.c_int
    lib.wdm_decode_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.wdm_make_crop_batch.restype = ctypes.c_int
    lib.wdm_make_crop_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def available() -> bool:
    return os.path.exists(_LIB_PATH)


def decode_image(path: str, max_h: int = 4096, max_w: int = 4096) -> np.ndarray:
    """Decode one JPEG/PNG to float32 [0,1] HWC RGB."""
    lib = _load()
    buf = np.empty((max_h, max_w, 3), np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.wdm_decode_image(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_h, max_w, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"native decode failed (rc={rc}) for {path}")
    return buf.reshape(-1)[: h.value * w.value * 3].reshape(
        h.value, w.value, 3).copy()


def make_crop_batch(input_paths: Sequence[str], gt_paths: Sequence[str],
                    patch_n: int, patch: int, seed: int,
                    n_threads: int = 0) -> np.ndarray:
    """Decode image pairs and assemble the training crop batch natively.

    Returns (len(paths)*patch_n, patch, patch, 6) float32 [cond|gt] in [0,1].
    """
    lib = _load()
    n = len(input_paths)
    assert len(gt_paths) == n
    out = np.zeros((n * patch_n, patch, patch, 6), np.float32)
    arr_t = ctypes.c_char_p * n
    inp = arr_t(*[p.encode() for p in input_paths])
    gts = arr_t(*[p.encode() for p in gt_paths])
    ok = lib.wdm_make_crop_batch(
        inp, gts, n, patch_n, patch, ctypes.c_uint64(seed), n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if ok != n:
        raise IOError(f"native batch: only {ok}/{n} image pairs decoded")
    return out
