"""ctypes binding for the native IO core (native/libcdtpu.so).

Loaded lazily; every caller falls back to pure numpy when the library
is absent or fails to load. Build with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "native", "libcdtpu.so"),
        os.environ.get("CDTPU_NATIVE_LIB", ""),
    ):
        if cand and os.path.isfile(cand):
            try:
                lib = ctypes.CDLL(cand)
            except OSError:
                continue
            lib.cdtpu_raw_header.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            lib.cdtpu_raw_read.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int64]
            lib.cdtpu_raw_write.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
            lib.cdtpu_raw_read_batch.argtypes = [
                ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def read_header(path: str):
    """(H, W, C) from a .raw file's header — no pixel IO."""
    lib = _load()
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    c = ctypes.c_int32()
    rc = lib.cdtpu_raw_header(path.encode(), ctypes.byref(h),
                              ctypes.byref(w), ctypes.byref(c))
    if rc == -1:
        raise FileNotFoundError(path)
    if rc != 0:
        raise ValueError(f"bad .raw header in {path} (rc={rc})")
    return h.value, w.value, c.value


def load_raw(path: str) -> np.ndarray:
    lib = _load()
    h, w, c = (ctypes.c_int32(v) for v in read_header(path))
    out = np.empty((h.value, w.value, c.value), np.float32)
    rc = lib.cdtpu_raw_read(path.encode(), out.reshape(-1), out.size)
    if rc != 0:
        raise ValueError(f"failed reading {path} (rc={rc})")
    return out[..., 0] if c.value == 1 else out


def save_raw(path: str, image: np.ndarray) -> None:
    lib = _load()
    img = np.ascontiguousarray(image, np.float32)
    if img.ndim == 2:
        h, w = img.shape
        c = 1
    else:
        h, w, c = img.shape
    rc = lib.cdtpu_raw_write(path.encode(), img.reshape(-1), h, w, c)
    if rc != 0:
        raise IOError(f"failed writing {path} (rc={rc})")


def load_raw_batch(paths, h: int, w: int, c: int) -> np.ndarray:
    """Read n same-shaped .raw files into one (n, h, w, c) array."""
    lib = _load()
    n = len(paths)
    out = np.empty((n, h, w, c), np.float32)
    joined = "\n".join(paths).encode()
    rc = lib.cdtpu_raw_read_batch(joined, n, h, w, c, out.reshape(-1))
    if rc != 0:
        raise IOError(f"batched raw read failed (rc={rc})")
    return out
