"""Native (C++) runtime components, loaded via ctypes.

The reference vendors a C++/CUDA searchsorted extension
(`DS_NeRF/torchsearchsorted/`); here the C++ oracle is compiled on demand with
the system toolchain (g++, no pybind11 dependency) and exposed through ctypes.
The TPU hot path uses the Pallas kernel — this oracle exists for parity tests
and host-side fallbacks, mirroring the reference's CPU extension role.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "searchsorted.cpp")
_BUILD_DIR = os.path.join(_REPO, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libmvip_searchsorted.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
    return _SO


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        for name in ("searchsorted_f32", "searchsorted_f64"):
            fn = getattr(lib, name)
            fn.restype = None
        _lib = lib
    return _lib


def searchsorted(a: np.ndarray, v: np.ndarray, side: str = "left") -> np.ndarray:
    """Batched row-wise searchsorted (C++ oracle).

    a [ba, n_a] sorted rows, v [bv, n_v] queries; ba/bv broadcast when either is
    1 (reference `torchsearchsorted` semantics). Returns int64 [max(ba,bv), n_v].
    """
    assert a.ndim == 2 and v.ndim == 2, "expects 2-D batched inputs"
    assert a.shape[0] == v.shape[0] or a.shape[0] == 1 or v.shape[0] == 1
    if a.dtype == np.float64 or v.dtype == np.float64:
        a = np.ascontiguousarray(a, np.float64)
        v = np.ascontiguousarray(v, np.float64)
        fn = _load().searchsorted_f64
        cptr = ctypes.POINTER(ctypes.c_double)
    else:
        a = np.ascontiguousarray(a, np.float32)
        v = np.ascontiguousarray(v, np.float32)
        fn = _load().searchsorted_f32
        cptr = ctypes.POINTER(ctypes.c_float)

    rows = max(a.shape[0], v.shape[0])
    out = np.empty((rows, v.shape[1]), np.int64)
    fn(
        a.ctypes.data_as(cptr),
        v.ctypes.data_as(cptr),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(a.shape[0]),
        ctypes.c_int64(a.shape[1]),
        ctypes.c_int64(v.shape[0]),
        ctypes.c_int64(v.shape[1]),
        ctypes.c_int32(1 if side == "right" else 0),
    )
    return out
