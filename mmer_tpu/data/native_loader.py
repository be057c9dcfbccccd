"""ctypes binding for the native bulk .npy loader (native/npy_loader.cpp).

Loads ~17.8k small feature artifacts with a C++ thread pool instead of
per-file ``np.load`` calls.  Gracefully unavailable: callers fall back to
the Python path when the shared library can't be built/found, so the
framework never hard-depends on a compiler at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmmer_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load_library(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if auto_build:
        # ALWAYS run make BEFORE the first dlopen: make's dependency check
        # is a ~50 ms no-op when the .so is fresh, and rebuilding a stale
        # one after loading is useless — glibc caches dlopen by pathname,
        # so a second CDLL of the same path returns the SAME stale handle.
        # On failure keep whatever .so exists (never delete a working
        # artifact; missing symbols degrade to the Python fallbacks).
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            pass
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        if lib.mmer_native_version() != 1:
            return None
        lib.mmer_load_f32_batch.restype = ctypes.c_int
        lib.mmer_load_f16_vec_batch.restype = ctypes.c_int
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    return _load_library() is not None


def _path_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def load_f32_batch(paths: Sequence[str], cols: int, max_rows: int,
                   n_threads: int = 16) -> Tuple[np.ndarray, np.ndarray]:
    """→ (out (N, max_rows, cols) float32 zero-padded, rows (N,) int32).

    rows[i] == -1 marks a failed/contract-violating file.
    """
    lib = _load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.zeros((n, max_rows, cols), np.float32)
    rows = np.zeros(n, np.int32)
    lib.mmer_load_f32_batch(
        _path_array(paths), ctypes.c_int(n), ctypes.c_long(cols),
        ctypes.c_long(max_rows),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(n_threads))
    return out, rows


def load_f16_vec_batch(paths: Sequence[str], length: int,
                       n_threads: int = 16) -> Tuple[np.ndarray, int]:
    """→ ((N, length) float32, n_failures)."""
    lib = _load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.zeros((n, length), np.float32)
    failures = lib.mmer_load_f16_vec_batch(
        _path_array(paths), ctypes.c_int(n), ctypes.c_long(length),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n_threads))
    return out, int(failures)


def load_feature_arrays_native(video_paths: Sequence[str],
                               audio_paths: Sequence[str],
                               video_dim: int = 768, audio_dim: int = 1024,
                               max_rows: int = 64, n_threads: int = 16
                               ) -> Optional[Tuple[List[np.ndarray], np.ndarray]]:
    """Native fast-path for data/pipeline.load_feature_arrays.

    Returns None when the library is unavailable or any file fails (callers
    fall back to the Python loader, which raises precise errors).
    """
    if not available():
        return None
    video_padded, rows = load_f32_batch(video_paths, video_dim, max_rows,
                                        n_threads)
    if (rows < 0).any():
        return None
    audios, failures = load_f16_vec_batch(audio_paths, audio_dim, n_threads)
    if failures:
        return None
    videos: List[np.ndarray] = []
    for i in range(len(video_paths)):
        if rows[i] > max_rows:   # oversized artifact: slow-path re-read
            videos.append(np.load(video_paths[i]).astype(np.float32))
        else:
            videos.append(video_padded[i, :rows[i]])
    return videos, audios
