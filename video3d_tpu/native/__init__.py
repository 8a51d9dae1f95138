"""Native (C++) host-side components.

``load_depth_png`` decodes ScanNet 16-bit grayscale depth PNGs through a
specialized C++ reader (depth_png.cc) — the per-frame decode is the
reference dataloader's hot path. The shared library is built on first use
with the system g++ (no pybind11/setuptools needed; plain ctypes); if the
toolchain or zlib headers are unavailable it falls back to PIL transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libdepthpng.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _ensure_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                     os.path.join(_DIR, "depth_png.cc"), "-o", _LIB_PATH, "-lz"],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.decode_depth_png.restype = ctypes.c_int
            lib.decode_depth_png.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except OSError:
            _build_failed = True
    return _lib


_MAX_PIXELS = 4096 * 4096


def load_depth_png(path: str) -> np.ndarray:
    """Decode a 16-bit grayscale depth PNG -> (H, W) uint16 array.

    Uses the C++ decoder when available (GIL released during the call);
    falls back to PIL for unsupported formats or missing toolchain.
    """
    lib = _ensure_lib()
    if lib is not None:
        with open(path, "rb") as f:
            data = f.read()
        out = np.empty(_MAX_PIXELS, np.uint16)
        w = ctypes.c_int32(0)
        h = ctypes.c_int32(0)
        ret = lib.decode_depth_png(
            data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            _MAX_PIXELS, ctypes.byref(w), ctypes.byref(h))
        if ret == 0:
            return out[: h.value * w.value].reshape(h.value, w.value).copy()
        # fall through to PIL on unsupported formats
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im).astype(np.uint16)
