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
    except Exception:
        return None
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_ip = ctypes.POINTER(ctypes.c_int64)
    c_intp = ctypes.POINTER(ctypes.c_int)
    lib.treestore_create.restype = ctypes.c_void_p
    lib.treestore_create.argtypes = [ctypes.c_int64, ctypes.c_int]
    lib.treestore_destroy.argtypes = [ctypes.c_void_p]
    lib.treestore_push.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        c_dp, c_dp, c_dp, ctypes.c_int, ctypes.c_int64]
    lib.treestore_push_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, c_ip, c_ip, c_dp, c_dp, c_dp,
        c_dp, c_intp, c_ip]
    lib.treestore_pop_batch.restype = ctypes.c_int64
    lib.treestore_pop_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_double, c_dp, c_dp, c_dp,
        c_intp, c_dp, c_ip, c_ip, c_ip, c_ip]
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
    """ctypes wrapper; same contract as bnb.tree.TreeManager's heap but
    batch pops return dense slabs."""

    def __init__(self, n: int, order: int = 2):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native treestore unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.treestore_create(n, order))
        self.n = n

    def __del__(self):  # pragma: no cover
        try:
            if getattr(self, "_h", None):
                self._lib.treestore_destroy(self._h)
                self._h = None
        except Exception:
            pass

    def push(self, nid: int, depth: int, lb: float, vlb: np.ndarray,
             vub: np.ndarray, warm: Optional[np.ndarray] = None,
             bvar: int = -1) -> None:
        vlb = np.ascontiguousarray(vlb, dtype=np.float64)
        vub = np.ascontiguousarray(vub, dtype=np.float64)
        if warm is None:
            w = np.zeros(self.n)
            hw = 0
        else:
            w = np.ascontiguousarray(warm, dtype=np.float64)
            hw = 1
        self._lib.treestore_push(self._h, nid, depth, lb, _dp(vlb),
                                 _dp(vub), _dp(w), hw, bvar)

    def push_batch(self, nid: np.ndarray, depth: np.ndarray,
                   lb: np.ndarray, vlb: np.ndarray, vub: np.ndarray,
                   warm: np.ndarray, has_warm: np.ndarray,
                   bvar: np.ndarray) -> None:
        k = len(lb)
        nid = np.ascontiguousarray(nid, dtype=np.int64)
        depth = np.ascontiguousarray(depth, dtype=np.int64)
        lb = np.ascontiguousarray(lb, dtype=np.float64)
        vlb = np.ascontiguousarray(vlb, dtype=np.float64)
        vub = np.ascontiguousarray(vub, dtype=np.float64)
        warm = np.ascontiguousarray(warm, dtype=np.float64)
        has_warm = np.ascontiguousarray(has_warm, dtype=np.int32)
        bvar = np.ascontiguousarray(bvar, dtype=np.int64)
        self._lib.treestore_push_batch(
            self._h, k,
            nid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            _dp(lb), _dp(vlb), _dp(vub), _dp(warm),
            has_warm.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            bvar.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))

    def pop_batch(self, k: int, cutoff: float = 1e300):
        n = self.n
        vlb = np.empty((k, n))
        vub = np.empty((k, n))
        warm = np.empty((k, n))
        has_warm = np.empty(k, dtype=np.int32)
        lb = np.empty(k)
        depth = np.empty(k, dtype=np.int64)
        nid = np.empty(k, dtype=np.int64)
        bvar = np.empty(k, dtype=np.int64)
        pruned = ctypes.c_int64(0)
        got = self._lib.treestore_pop_batch(
            self._h, k, cutoff, _dp(vlb), _dp(vub), _dp(warm),
            has_warm.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            _dp(lb), depth.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            nid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            bvar.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.byref(pruned))
        return (got, pruned.value, vlb[:got], vub[:got], warm[:got],
                has_warm[:got], lb[:got], depth[:got], nid[:got],
                bvar[:got])

    def prune(self, cutoff: float) -> int:
        return int(self._lib.treestore_prune(self._h, cutoff))

    def best_lb(self) -> float:
        v = float(self._lib.treestore_best_lb(self._h))
        return float("inf") if v >= 1e299 else v

    def __len__(self) -> int:
        return int(self._lib.treestore_size(self._h))
