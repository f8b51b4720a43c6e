"""ctypes bindings for the native IO library (decode + prefetch).

The reference's dataset layer is native C++ (srrg2_core message sources +
OpenCV decode; SURVEY.md F11); this module binds the framework's own native
equivalent (native/src/*.cpp): a dependency-free PNG/PGM decoder and a
threaded in-order prefetcher that hides decode latency behind device
compute.  Falls back to PIL transparently when the library is not built
(`make -C native`).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "native",
    "libproslam_io.so",
)
_lib = None


def _build_library() -> bool:
    native_dir = os.path.dirname(_LIB_PATH)
    try:
        subprocess.run(["make", "-C", native_dir], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library(build_if_missing: bool = True):
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        _build_library()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.psl_decode_file.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.psl_decode_file.argtypes = [
        ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int)] * 4
    lib.psl_free.argtypes = [ctypes.c_void_p]
    lib.psl_prefetch_create.restype = ctypes.c_void_p
    lib.psl_prefetch_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.psl_prefetch_next.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.psl_prefetch_next.argtypes = [
        ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int)] * 4
    lib.psl_prefetch_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def _to_array(ptr, w: int, h: int, channels: int, bitdepth: int,
              lib) -> np.ndarray:
    dtype = np.uint16 if bitdepth == 16 else np.uint8
    count = w * h * channels
    buf = ctypes.cast(
        ptr, ctypes.POINTER(ctypes.c_uint8 * (count * dtype().itemsize))
    ).contents
    arr = np.frombuffer(buf, dtype=dtype).reshape(h, w, channels).copy()
    lib.psl_free(ptr)
    if channels == 1:
        return arr[:, :, 0]
    return arr


def decode(path: str) -> Optional[np.ndarray]:
    """Decode one image natively: [H, W] (gray) or [H, W, C] uint8/uint16."""
    lib = load_library()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    d = ctypes.c_int()
    ptr = lib.psl_decode_file(path.encode(), ctypes.byref(w), ctypes.byref(h),
                              ctypes.byref(c), ctypes.byref(d))
    if not ptr:
        return None
    return _to_array(ptr, w.value, h.value, c.value, d.value, lib)


def to_gray_f32(arr: np.ndarray) -> np.ndarray:
    """Match io.datasets.load_gray semantics: float32 grayscale 0..255."""
    # scale by dtype, not data: a dark 16-bit frame must scale exactly like
    # its bright neighbors (and like the PIL path in datasets.load_gray)
    scale_16 = arr.dtype == np.uint16
    if arr.ndim == 3:
        if arr.shape[2] >= 3:
            arr = (0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1]
                   + 0.114 * arr[:, :, 2])
        else:
            arr = arr[:, :, 0]
    arr = np.asarray(arr, np.float32)
    if scale_16:
        arr = arr / 256.0
    return np.ascontiguousarray(arr)


class Prefetcher:
    """In-order prefetching decoder over a list of files (native threads)."""

    def __init__(self, paths: List[str], n_threads: int = 4, window: int = 8):
        self._lib = load_library()
        if self._lib is None:
            raise RuntimeError("native IO library unavailable")
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = self._lib.psl_prefetch_create(
            arr, len(self._paths), n_threads, window
        )
        self._n = len(paths)
        self._consumed = 0

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        if self._consumed >= self._n:
            raise StopIteration
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        d = ctypes.c_int()
        ptr = self._lib.psl_prefetch_next(
            self._handle, ctypes.byref(w), ctypes.byref(h), ctypes.byref(c),
            ctypes.byref(d),
        )
        self._consumed += 1
        if not ptr:
            if w.value == -1:
                raise IOError("native decode failed for "
                              f"{self._paths[self._consumed - 1]!r}")
            raise StopIteration
        return _to_array(ptr, w.value, h.value, c.value, d.value, self._lib)

    def close(self):
        if self._handle:
            self._lib.psl_prefetch_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
