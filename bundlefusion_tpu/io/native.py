"""ctypes bindings for the native host codec (native/sens_codec.cpp).

Multithreaded zlib depth decode for the .sens input path — the equivalent
of the reference's C++ prefetch threads (``RGBDFrameCacheRead``). Falls back
to Python zlib when the shared library is absent; ``build_native()``
compiles it with the vendored Makefile.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import zlib
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libsenscodec.so")
_lib: Optional[ctypes.CDLL] = None


def build_native(quiet: bool = True) -> bool:
    """Compile native/libsenscodec.so. Returns True on success."""
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO_ROOT, "native")],
            check=True,
            capture_output=quiet,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not build_native():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.bf_decode_depth_batch.restype = ctypes.c_int
    lib.bf_decode_depth_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.c_int,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def decode_depth_batch(
    buffers: List[bytes],
    height: int,
    width: int,
    depth_shift: float,
    num_threads: int = 4,
) -> np.ndarray:
    """Decode zlib uint16 depth buffers -> [N, H, W] float32 meters
    (0 -> nan). Uses the native multithreaded path when available."""
    n = len(buffers)
    n_px = height * width
    lib = _load()
    if lib is not None:
        out = np.empty((n, n_px), np.float32)
        src_arr = (ctypes.c_char_p * n)(*buffers)
        len_arr = (ctypes.c_size_t * n)(*[len(b) for b in buffers])
        rc = lib.bf_decode_depth_batch(
            src_arr,
            len_arr,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            n_px,
            ctypes.c_float(depth_shift),
            num_threads,
        )
        if rc == 0:
            return out.reshape(n, height, width)
        # fall through to Python on error
    out = np.empty((n, height, width), np.float32)
    for i, buf in enumerate(buffers):
        raw = np.frombuffer(zlib.decompress(buf), np.uint16).reshape(height, width)
        d = raw.astype(np.float32) / depth_shift
        out[i] = np.where(raw > 0, d, np.nan)
    return out
