"""ctypes binding for the native TIFF decoder (native/tifffast.cpp).

Builds libtifffast.so on first use with g++ (cached next to the source) and
exposes single-file and threaded-batch decode plus encode. Every entry point
silently falls back to the PIL path (tiff.py) when the native lib is
unavailable or a file uses an unsupported layout — capability is identical,
only speed differs.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libtifffast.so"
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            src = _NATIVE_DIR / "tifffast.cpp"
            if not _SO_PATH.exists() or _SO_PATH.stat().st_mtime < src.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO_PATH), str(src),
                     "-lpthread"],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(str(_SO_PATH))
            lib.tiff_read_u16.restype = ctypes.c_int
            lib.tiff_read_u16.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int32,
                ctypes.c_int32,
            ]
            lib.tiff_read_batch_u16.restype = None
            lib.tiff_read_batch_u16.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.tiff_write_u16.restype = ctypes.c_int
            lib.tiff_write_u16.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int32,
                ctypes.c_int32,
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def read_tiff_u16_native(path: str | Path, h: int, w: int) -> np.ndarray | None:
    """Decode one file; None on any failure (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((h, w), np.uint16)
    rc = lib.tiff_read_u16(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), h, w
    )
    return out if rc == 0 else None


def read_batch_u16(paths: list, h: int, w: int, nthreads: int = 8) -> tuple[np.ndarray, np.ndarray] | None:
    """Threaded batch decode -> (batch (N,h,w) uint16, status (N,) int32)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, h, w), np.uint16)
    status = np.empty((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.tiff_read_batch_u16(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        h,
        w,
        nthreads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out, status


def write_u16_native(path: str | Path, u16: np.ndarray) -> bool:
    """Write an already-quantized (H, W) uint16 array; False -> PIL fallback."""
    lib = _load()
    if lib is None:
        return False
    u16 = np.ascontiguousarray(u16, dtype=np.uint16)
    rc = lib.tiff_write_u16(
        str(path).encode(),
        u16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        u16.shape[0],
        u16.shape[1],
    )
    return rc == 0


def write_tiff_u16_native(path: str | Path, img01: np.ndarray) -> bool:
    arr = np.clip(np.asarray(img01, np.float64), 0.0, 1.0)
    u16 = (arr * 65535.0).astype(np.uint16)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    return write_u16_native(path, u16)
