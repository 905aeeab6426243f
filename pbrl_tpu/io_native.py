"""ctypes binding for the native C++ clip loader (native/pbrl_io.cpp).

The native library is built lazily with ``make`` on first use and cached;
if the toolchain or library is unavailable (or ``PBRL_NATIVE=0``), callers
fall back to the pure-Python parser transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpbrl_io.so")
_LOOP_NAMES = {0: "none", 1: "wrap", 2: "mirror"}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if os.environ.get("PBRL_NATIVE", "1") == "0":
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.pbrl_load_clip.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.pbrl_load_clip.restype = ctypes.c_int
        lib.pbrl_load_clips.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.pbrl_load_clips.restype = ctypes.c_int
        lib.pbrl_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        lib.pbrl_last_error.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    return get_library() is not None


def load_frames(path: str) -> Tuple[np.ndarray, str]:
    """(frames (T, W) float64, loop) via the native parser.

    Raises RuntimeError with the native error message on parse failure.
    """
    lib = get_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    data = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    loop = ctypes.c_int()
    rc = lib.pbrl_load_clip(path.encode(), ctypes.byref(data),
                            ctypes.byref(rows), ctypes.byref(cols),
                            ctypes.byref(loop))
    if rc != 0:
        raise RuntimeError(
            f"native clip load failed ({rc}): "
            f"{lib.pbrl_last_error().decode()}: {path}")
    try:
        n = rows.value * cols.value
        arr = np.ctypeslib.as_array(data, shape=(n,)).reshape(
            rows.value, cols.value).copy()
    finally:
        lib.pbrl_free(data)
    return arr, _LOOP_NAMES.get(loop.value, "none")


def load_frames_batch(paths: List[str]):
    """Threaded parallel load of many clips: [(frames, loop) | None]."""
    lib = get_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    data = (ctypes.POINTER(ctypes.c_double) * n)()
    rows = (ctypes.c_int64 * n)()
    cols = (ctypes.c_int64 * n)()
    loops = (ctypes.c_int * n)()
    status = (ctypes.c_int * n)()
    lib.pbrl_load_clips(c_paths, n, data, rows, cols, loops, status)
    out = []
    for i in range(n):
        if status[i] != 0 or not data[i]:
            out.append(None)
            continue
        cnt = rows[i] * cols[i]
        arr = np.ctypeslib.as_array(data[i], shape=(cnt,)).reshape(
            rows[i], cols[i]).copy()
        lib.pbrl_free(data[i])
        out.append((arr, _LOOP_NAMES.get(loops[i], "none")))
    return out
