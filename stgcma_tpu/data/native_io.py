"""ctypes bindings to the native host-IO library (native/stgcma_host.cc):
multithreaded WAV decode + mono downmix + DC removal + segment slicing.

Falls back to the pure-Python (scipy) path in datasets.py when the shared
library hasn't been built (`make -C native`).
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libstgcma_host.so"),
    "libstgcma_host.so",
]

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(os.path.abspath(p) if os.path.sep in p else p)
            break
        except OSError:
            lib = None
    if lib is None:
        _lib = False
        return False
    lib.stgcma_decode_wav_batch.restype = ctypes.c_int
    lib.stgcma_decode_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    lib.stgcma_decode_wav.restype = ctypes.c_int64
    lib.stgcma_decode_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int),
    ]
    try:
        lib.stgcma_decode_image_batch.restype = ctypes.c_int
        lib.stgcma_decode_image_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.stgcma_decode_image.restype = ctypes.c_int64
        lib.stgcma_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib._has_image = True
    except AttributeError:  # pre-image .so on disk
        lib._has_image = False
    _lib = lib
    return lib


def available() -> bool:
    return bool(_load())


def decode_wav_batch(paths: List[str], num_segments: int, seg_samples: int,
                     margin_s: float = 0.1, num_threads: int = 8
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """-> (waves (B, num_segments, seg_samples) f32, ok (B,) bool)."""
    lib = _load()
    if not lib:
        raise RuntimeError("native host-IO library not built (make -C native)")
    B = len(paths)
    out = np.zeros((B, num_segments, seg_samples), np.float32)
    ok = np.zeros((B,), np.uint8)
    arr = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
    lib.stgcma_decode_wav_batch(
        arr, B, num_segments, seg_samples, ctypes.c_float(margin_s),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads)
    return out, ok.astype(bool)


def image_available() -> bool:
    lib = _load()
    return bool(lib) and getattr(lib, "_has_image", False)


def decode_image_batch(paths: List[str], height: int, width: int,
                       num_threads: int = 8
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode jpg/png files into (B, height, width, 3) uint8, multithreaded in
    C (native/stgcma_host.cc). Frames already at (height, width) are bit-exact
    vs PIL (same libjpeg-turbo/libpng decoders); others get a host bilinear
    resize. -> (frames, ok (B,) bool)."""
    lib = _load()
    if not lib or not lib._has_image:
        raise RuntimeError("native image decode not built (make -C native)")
    B = len(paths)
    out = np.zeros((B, height, width, 3), np.uint8)
    ok = np.zeros((B,), np.uint8)
    arr = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
    lib.stgcma_decode_image_batch(
        arr, B, height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads)
    return out, ok.astype(bool)


def decode_image(path: str, max_bytes: int = 64 << 20
                 ) -> Optional[np.ndarray]:
    """Decode one jpg/png at native size -> (H, W, 3) uint8, or None."""
    lib = _load()
    if not lib or not lib._has_image:
        return None
    buf = np.zeros((max_bytes,), np.uint8)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    n = lib.stgcma_decode_image(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_bytes, ctypes.byref(w), ctypes.byref(h))
    if n <= 0:
        return None
    return buf[:n].reshape(h.value, w.value, 3).copy()


def decode_wav(path: str, max_seconds: float = 60.0) -> Optional[Tuple[np.ndarray, int]]:
    lib = _load()
    if not lib:
        return None
    max_samples = int(max_seconds * 48000)
    buf = np.zeros((max_samples,), np.float32)
    sr = ctypes.c_int(0)
    n = lib.stgcma_decode_wav(path.encode(),
                              buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                              max_samples, ctypes.byref(sr))
    if n <= 0:
        return None
    return buf[:n].copy(), sr.value
