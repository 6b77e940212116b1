"""ctypes binding for the native point-generation library (native/pointgen.cpp).

Every entry point has a NumPy fallback in data/sampling.py; this module is
an accelerator, not a dependency. `available()` reports whether the shared
library was found (built via `make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_D = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
_F = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
_I = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")


def _find_lib() -> Optional[str]:
    """Search order: explicit env override, the installed package's
    bundled copy (built by `python setup.py build_native` / pip install),
    then the source-tree layout (`make -C native`)."""
    env = os.environ.get("NSFNET_POINTGEN_LIB")
    if env:
        return env if os.path.exists(env) else None
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo = os.path.dirname(pkg_dir)
    for path in (os.path.join(pkg_dir, "_native", "libpointgen.so"),
                 os.path.join(repo, "native", "libpointgen.so")):
        if os.path.exists(path):
            return path
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.lh_sample.argtypes = [ctypes.c_int64, ctypes.c_int64, _D,
                                  ctypes.c_uint64, _D]
        lib.min_distance.argtypes = [ctypes.c_int64, _D, ctypes.c_int64, _D, _D]
        lib.box_boundary_distance.argtypes = [ctypes.c_int64, _D,
                                              ctypes.c_double, ctypes.c_double, _D]
        lib.sdf_weights.argtypes = [ctypes.c_int64, _D, ctypes.c_double,
                                    ctypes.c_double, ctypes.c_double,
                                    ctypes.c_double, _F]
        lib.sort_by_distance.argtypes = [ctypes.c_int64, _D, ctypes.c_int64, _D, _I]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def lh_sample(n: int, bounds, seed: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    b = np.ascontiguousarray(bounds, dtype=np.float64)
    out = np.empty((n, b.shape[0]), dtype=np.float64)
    lib.lh_sample(n, b.shape[0], b, seed & (2**64 - 1), out)
    return out


def min_distance(pts: np.ndarray, ref: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    p = np.ascontiguousarray(pts, dtype=np.float64)
    r = np.ascontiguousarray(ref, dtype=np.float64)
    out = np.empty(p.shape[0], dtype=np.float64)
    lib.min_distance(p.shape[0], p, r.shape[0], r, out)
    return out


def sdf_weights(pts: np.ndarray, lo: float, hi: float, min_w: float,
                decay: float) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    p = np.ascontiguousarray(pts, dtype=np.float64)
    out = np.empty(p.shape[0], dtype=np.float32)
    lib.sdf_weights(p.shape[0], p, lo, hi, min_w, decay, out)
    return out


def sort_by_distance(pts: np.ndarray, ref: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    p = np.ascontiguousarray(pts, dtype=np.float64)
    r = np.ascontiguousarray(ref, dtype=np.float64)
    order = np.empty(p.shape[0], dtype=np.int64)
    lib.sort_by_distance(p.shape[0], p, r.shape[0], r, order)
    return p[order]
