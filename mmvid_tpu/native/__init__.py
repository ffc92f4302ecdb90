"""ctypes bindings for the native data-loader core (mmvid_native.cpp).

Builds the shared library with g++ on first import (cached next to the
source); every entry point has a pure-Python/PIL fallback so the framework
runs without a toolchain.  The resize filter is Pillow-compatible
(triangle/bilinear with downscale-scaled support), verified in
tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'mmvid_native.cpp')
_SO = os.path.join(_DIR, 'libmmvid_native.so')

_lib = None
_lock = threading.Lock()
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = ['g++', '-O3', '-fPIC', '-shared', '-std=c++17', _SRC,
           '-o', _SO, '-ljpeg', '-lpng', '-pthread']
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return str(e)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build_error = _build()
            if _build_error is not None:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.mmvid_image_dims.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.mmvid_load_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.mmvid_resize_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
        lib.mmvid_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_image(path: str, size: int) -> np.ndarray:
    """Decode + resize to [size,size,3] float32 [0,1]; PIL fallback."""
    lib = get_lib()
    if lib is not None:
        out = np.empty((size, size, 3), np.float32)
        rc = lib.mmvid_load_image(
            path.encode(), size, size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc == 0:
            return out
    from mmvid_tpu.data.transforms import open_rgb, resize_exact, to_array
    return to_array(resize_exact(open_rgb(path), (size, size)))


def load_batch(paths: Sequence[str], size: int,
               n_threads: int = 0) -> np.ndarray:
    """Threaded batch decode -> [N,size,size,3] float32 [0,1]."""
    lib = get_lib()
    if lib is not None:
        n = len(paths)
        out = np.empty((n, size, size, 3), np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failed = lib.mmvid_load_batch(
            arr, n, size, size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
        if failed == 0:
            return out
    return np.stack([load_image(p, size) for p in paths])


def resize_normalize(src_u8: np.ndarray, size: int) -> np.ndarray:
    """uint8 HWC -> float32 [size,size,3] in [0,1]; PIL fallback."""
    lib = get_lib()
    if lib is not None and src_u8.dtype == np.uint8 and src_u8.ndim == 3:
        src = np.ascontiguousarray(src_u8)
        out = np.empty((size, size, 3), np.float32)
        lib.mmvid_resize_normalize(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            src.shape[0], src.shape[1],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size, size)
        return out
    from PIL import Image
    img = Image.fromarray(src_u8).resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0
