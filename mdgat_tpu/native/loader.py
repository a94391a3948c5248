"""ctypes bindings + lazy build for the native threaded batch loader.

The shared library is compiled on first use with g++ -O3 (cached next to
the source); when a toolchain is unavailable the callers fall back to the
pure-numpy path, so the native layer is an accelerator, never a
requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cc")
_LIB = os.path.join(_DIR, "libmdgat_loader.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    with _lock:
        if os.path.exists(_LIB) and \
                os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return ctypes.CDLL(_LIB)
        if _build_failed:
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", "-pthread", _SRC, "-o", _LIB],
                check=True, capture_output=True)
            return ctypes.CDLL(_LIB)
        except Exception:
            _build_failed = True
            return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None:
        lib = _build()
        if lib is None:
            return None
        lib.mdgat_load_batch.restype = ctypes.c_int
        lib.mdgat_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int)]
        _lib = lib
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


class NativeLoader:
    """Threaded batched keypoint-file loader (DataLoader equivalent, X2)."""

    def __init__(self, max_kpts: int, ensure_kpts_num: bool,
                 score_min: float = 10.0, n_threads: int = 4):
        self.max_kpts = max_kpts
        self.ensure = ensure_kpts_num
        self.score_min = score_min
        self.n_threads = n_threads
        self.lib = _get_lib()
        if self.lib is None:
            raise RuntimeError("native loader unavailable (g++ build failed)")

    def load(self, paths: List[str]
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        n = len(paths)
        kp = np.empty((n, self.max_kpts, 3), np.float32)
        score = np.empty((n, self.max_kpts), np.float32)
        desc = np.empty((n, self.max_kpts, 33), np.float32)
        counts = np.empty((n,), np.int32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = self.lib.mdgat_load_batch(
            arr, n, self.max_kpts, int(self.ensure),
            ctypes.c_float(self.score_min), self.n_threads,
            kp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            score.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            desc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        if rc != 0:
            raise RuntimeError(f"mdgat_load_batch failed rc={rc}")
        if (counts < 0).any():
            bad = [paths[i] for i in np.nonzero(counts < 0)[0][:3]]
            raise IOError(f"native loader failed on {bad}")
        return kp, score, desc, counts
