"""Native (C++) runtime components, bound via ctypes.

The reference's runtime is C++ end to end; here the device compute path
is jax/XLA and the *host* runtime pieces that sit on the superstep
critical path are C++: the node store (treestore.cpp).  The shared
library builds on first use with g++ and is cached next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtreestore.so")
_SRC = os.path.join(_DIR, "treestore.cpp")

_lib: Optional[ctypes.CDLL] = None

#: scalar record layout (must match treestore.cpp kScalars block)
SCAL_NID, SCAL_DEPTH, SCAL_LB, SCAL_BVAR, SCAL_BDIR, SCAL_BFRAC, \
    SCAL_VIO, SCAL_PRED_ITERS, SCAL_TB, SCAL_HAS_X, SCAL_HAS_Y = range(11)
N_SCALARS = 11


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
        check=True, capture_output=True)


def load_library() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native library; None on failure."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.treestore_scalars.restype = ctypes.c_int64
        if lib.treestore_scalars() != N_SCALARS:
            _build()
            lib = ctypes.CDLL(_SO)
            lib.treestore_scalars.restype = ctypes.c_int64
    except Exception:
        return None
    c_dp = ctypes.POINTER(ctypes.c_double)
    lib.treestore_create.restype = ctypes.c_void_p
    lib.treestore_create.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int]
    lib.treestore_destroy.argtypes = [ctypes.c_void_p]
    lib.treestore_push.argtypes = [ctypes.c_void_p, c_dp, c_dp, c_dp,
                                   c_dp, c_dp]
    lib.treestore_push_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, c_dp, c_dp, c_dp, c_dp, c_dp]
    lib.treestore_pop_batch.restype = ctypes.c_int64
    lib.treestore_pop_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_double, c_dp, c_dp,
        c_dp, c_dp, c_dp, ctypes.POINTER(ctypes.c_int64)]
    lib.treestore_prune.restype = ctypes.c_int64
    lib.treestore_prune.argtypes = [ctypes.c_void_p, ctypes.c_double]
    lib.treestore_best_lb.restype = ctypes.c_double
    lib.treestore_best_lb.argtypes = [ctypes.c_void_p]
    lib.treestore_size.restype = ctypes.c_int64
    lib.treestore_size.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeTreeStore:
    """ctypes wrapper over the C++ slab store.  Nodes live as rows of
    contiguous (scalars, vlb, vub, warm_x, warm_y) arrays; batch pops
    return dense slabs ready for the device superstep."""

    def __init__(self, n: int, m: int = 0, order: int = 2):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native treestore unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.treestore_create(n, m, order))
        self.n = n
        self.m = m

    def __del__(self):  # pragma: no cover
        try:
            if getattr(self, "_h", None):
                self._lib.treestore_destroy(self._h)
                self._h = None
        except Exception:
            pass

    def push(self, scal: np.ndarray, vlb: np.ndarray, vub: np.ndarray,
             warm_x: Optional[np.ndarray] = None,
             warm_y: Optional[np.ndarray] = None) -> None:
        scal = np.ascontiguousarray(scal, dtype=np.float64)
        assert scal.shape == (N_SCALARS,)
        vlb = np.ascontiguousarray(vlb, dtype=np.float64)
        vub = np.ascontiguousarray(vub, dtype=np.float64)
        wx = np.ascontiguousarray(warm_x, dtype=np.float64) \
            if warm_x is not None else np.zeros(self.n)
        wy = np.ascontiguousarray(warm_y, dtype=np.float64) \
            if warm_y is not None else np.zeros(max(self.m, 1))
        self._lib.treestore_push(self._h, _dp(scal), _dp(vlb), _dp(vub),
                                 _dp(wx), _dp(wy))

    def push_batch(self, scal: np.ndarray, vlb: np.ndarray,
                   vub: np.ndarray, warm_x: np.ndarray,
                   warm_y: np.ndarray) -> None:
        k = scal.shape[0]
        scal = np.ascontiguousarray(scal, dtype=np.float64)
        vlb = np.ascontiguousarray(vlb, dtype=np.float64)
        vub = np.ascontiguousarray(vub, dtype=np.float64)
        warm_x = np.ascontiguousarray(warm_x, dtype=np.float64)
        warm_y = np.ascontiguousarray(warm_y, dtype=np.float64)
        self._lib.treestore_push_batch(self._h, k, _dp(scal), _dp(vlb),
                                       _dp(vub), _dp(warm_x), _dp(warm_y))

    def pop_batch(self, k: int, cutoff: float = 1e300):
        """-> (got, pruned, scal, vlb, vub, warm_x, warm_y) slabs."""
        n, m = self.n, max(self.m, 1)
        scal = np.empty((k, N_SCALARS))
        vlb = np.empty((k, n))
        vub = np.empty((k, n))
        wx = np.empty((k, n))
        wy = np.empty((k, m))
        pruned = ctypes.c_int64(0)
        got = self._lib.treestore_pop_batch(
            self._h, k, cutoff, _dp(scal), _dp(vlb), _dp(vub), _dp(wx),
            _dp(wy), ctypes.byref(pruned))
        return (got, pruned.value, scal[:got], vlb[:got], vub[:got],
                wx[:got], wy[:got])

    def prune(self, cutoff: float) -> int:
        return int(self._lib.treestore_prune(self._h, cutoff))

    def best_lb(self) -> float:
        v = float(self._lib.treestore_best_lb(self._h))
        return float("inf") if v >= 1e299 else v

    def __len__(self) -> int:
        return int(self._lib.treestore_size(self._h))
