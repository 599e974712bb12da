"""ctypes bindings for the native (C++) decode/batch-load runtime.

``native/dataloader.cpp`` replaces the reference's 8-worker torch DataLoader
processes (SURVEY.md §3.1) for the host-side half of the data path: JPEG/PNG
decode + center-crop + resize + batch assembly run in C++ with a thread pool,
filling a preallocated uint8 batch buffer — Python never touches pixels.

Auto-builds the shared library with g++ on first use (cached); callers fall
back to the cv2 decode path if the toolchain or libjpeg/libpng are absent
(``available()``).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libd3f_native.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    src = _NATIVE_DIR / "dataloader.cpp"
    if not src.exists():
        return False
    cmd = ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o",
           str(_SO_PATH), str(src), "-ljpeg", "-lpng", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _SO_PATH.exists() and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
        except OSError:
            _build_failed = True
            return None
        lib.d3f_decode_image.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                         ctypes.POINTER(ctypes.c_uint8)]
        lib.d3f_decode_image.restype = ctypes.c_int
        lib.d3f_image_dims.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int),
                                       ctypes.POINTER(ctypes.c_int)]
        lib.d3f_image_dims.restype = ctypes.c_int
        lib.d3f_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int)]
        lib.d3f_load_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_image(path: str, target_size: int) -> np.ndarray:
    """Decode + center-crop + resize one image to (target, target, 3) RGB."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((target_size, target_size, 3), np.uint8)
    rc = lib.d3f_decode_image(
        str(path).encode(), target_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise IOError(f"native decode failed: {path}")
    return out


def image_dims(path: str) -> tuple[int, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.d3f_image_dims(str(path).encode(), ctypes.byref(w),
                          ctypes.byref(h)) != 0:
        raise IOError(f"native probe failed: {path}")
    return w.value, h.value


def load_batch(paths: list[str], target_size: int, *,
               n_threads: int = 4, out: np.ndarray | None = None) -> np.ndarray:
    """Decode a whole batch into one (N, target, target, 3) uint8 array."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    if out is None:
        out = np.empty((n, target_size, target_size, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    err = ctypes.c_int(-1)
    rc = lib.d3f_load_batch(arr, n, target_size, n_threads,
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                            ctypes.byref(err))
    if rc != 0:
        raise IOError(f"native decode failed: {paths[err.value]}")
    return out


class NativeBatchSource:
    """Batch-granular decode hook for ImageLoader (`load_batch_fn` protocol)."""

    def __init__(self, image_size: int, n_threads: int = 4):
        if not available():
            raise RuntimeError("native loader unavailable")
        self.image_size = image_size
        self.n_threads = n_threads

    def __call__(self, paths: list[str]) -> np.ndarray:
        return load_batch(paths, self.image_size, n_threads=self.n_threads)
