"""ctypes loader for the native host kernels (native/sctb_native.cpp).

Compiles on first use with g++ into ``native/build/`` and exposes:

* :func:`rle_encode` / :func:`rle_decode` — pycocotools-format RLE, the AMG
  finalisation hot path (thousands of masks per image);
* :func:`connected_components_with_areas` — 8-connectivity union-find CCL for
  the small-region postprocess.

Pure-numpy fallbacks exist in ops/rle.py and via cv2 in ops/regions.py; this
module returns None from :func:`load` when no compiler is available so callers
can degrade gracefully.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent / "native"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[Path]:
    src = _ROOT / "sctb_native.cpp"
    if not src.exists():
        return None
    out_dir = _ROOT / "build"
    out_dir.mkdir(exist_ok=True)
    lib = out_dir / "libsctb_native.so"
    if lib.exists() and lib.stat().st_mtime >= src.stat().st_mtime:
        return lib
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(lib)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    return lib


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    lib_path = _build()
    if lib_path is None:
        return None
    lib = ctypes.CDLL(str(lib_path))
    lib.rle_encode_fortran.restype = ctypes.c_int
    lib.rle_encode_fortran.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    lib.rle_decode_fortran.restype = None
    lib.rle_decode_fortran.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    lib.connected_components_8.restype = ctypes.c_int
    lib.connected_components_8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int]
    _LIB = lib
    return lib


def _u8(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def rle_encode(mask: np.ndarray) -> Optional[list]:
    """(H, W) bool -> counts list, or None if native unavailable."""
    lib = load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    cap = h * w + 2
    out = np.empty(cap, np.int32)
    n = lib.rle_encode_fortran(_u8(mask), h, w, _i32(out), cap)
    if n < 0:
        return None
    return out[:n].tolist()


def rle_decode(counts, h: int, w: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    counts_arr = np.ascontiguousarray(counts, np.int32)
    out = np.empty((h, w), np.uint8)
    lib.rle_decode_fortran(_i32(counts_arr), len(counts_arr), h, w, _u8(out))
    return out.astype(bool)


def connected_components_with_areas(mask: np.ndarray
                                    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(H, W) bool -> (labels int32 (0=bg), areas (n_labels,)) or None."""
    lib = load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    labels = np.empty((h, w), np.int32)
    max_labels = h * w // 2 + 2
    areas = np.empty(max_labels, np.int32)
    n = lib.connected_components_8(_u8(mask), h, w, _i32(labels), _i32(areas),
                                   max_labels)
    if n < 0:
        return None
    return labels, areas[:n].copy()
