"""ctypes bindings for the native CGGI core (CPU backend + independent oracle).

Builds ``libcggi_core.so`` on demand with g++ (no pybind11 dependency — plain
C ABI + ctypes).  See cggi_core.cpp for the implementation notes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cggi_core.cpp")
_LIB = os.path.join(_DIR, "libcggi_core.so")


def _build() -> str:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load():
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.cggi_engine_new.restype = ctypes.c_void_p
    lib.cggi_engine_new.argtypes = [ctypes.c_void_p] * 3
    lib.cggi_engine_free.argtypes = [ctypes.c_void_p]
    lib.cggi_bootstrap_batch.argtypes = [ctypes.c_void_p] * 4 + [ctypes.c_int]
    lib.cggi_num_threads.restype = ctypes.c_int
    return lib


_lib = None


def available() -> bool:
    global _lib
    if _lib is None:
        try:
            _lib = _load()
        except Exception:
            _lib = False
    return bool(_lib)


class NativeEngine:
    """OpenMP-parallel batched bootstrap engine over a CloudKey."""

    def __init__(self, cloud):
        if not available():
            raise RuntimeError("native cggi core unavailable (g++ build failed)")
        p = cloud.params
        self.params = p
        self._p_arr = np.array(
            [p.n, p.N, p.l, p.bg_bit, p.ks_t, p.ks_basebit], dtype=np.int32
        )
        self._bk = np.ascontiguousarray(cloud.bk, dtype=np.int32)
        self._ksk = np.ascontiguousarray(cloud.ksk, dtype=np.int32)
        self._h = _lib.cggi_engine_new(
            self._p_arr.ctypes.data, self._bk.ctypes.data, self._ksk.ctypes.data
        )

    def bootstrap(self, ct: np.ndarray, testvect: np.ndarray) -> np.ndarray:
        p = self.params
        ct = np.ascontiguousarray(ct.reshape(-1, p.n + 1), dtype=np.int32)
        tv = np.ascontiguousarray(testvect, dtype=np.int32)
        out = np.empty_like(ct)
        _lib.cggi_bootstrap_batch(
            self._h, ct.ctypes.data, tv.ctypes.data, out.ctypes.data, ct.shape[0]
        )
        return out

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                _lib.cggi_engine_free(self._h)
        except Exception:
            pass


def num_threads() -> int:
    return _lib.cggi_num_threads() if available() else 0
