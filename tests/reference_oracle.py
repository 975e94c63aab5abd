"""Compile the reference's C kernels as a test oracle.

The reference implementation at /root/reference ships two tiny C kernels
(mss.c, maxcalc.c).  For bit-parity testing we compile them (read-only, into
a temp dir — nothing is copied into this repo) and call them through ctypes.
Tests using the oracle skip gracefully when no C compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import List, Optional, Tuple

import numpy as np

_REF_DIR = "/root/reference/deepgrp"
_cached_lib: Optional[ctypes.CDLL] = None
_build_failed = False


class _RefSeg(ctypes.Structure):
    _fields_ = [("st", ctypes.c_int), ("en", ctypes.c_int),
                ("sc", ctypes.c_double)]


def load_reference_lib() -> Optional[ctypes.CDLL]:
    global _cached_lib, _build_failed
    if _cached_lib is not None or _build_failed:
        return _cached_lib
    sources = [os.path.join(_REF_DIR, "_mss", "mss.c"),
               os.path.join(_REF_DIR, "maxcalc.c")]
    if not all(os.path.exists(s) for s in sources):
        _build_failed = True
        return None
    out = os.path.join(tempfile.gettempdir(), "deepgrp_reference_oracle.so")
    try:
        if not os.path.exists(out):
            subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC", "-o", out, *sources,
                 "-I", os.path.join(_REF_DIR, "_mss"), "-I", _REF_DIR],
                check=True, capture_output=True, timeout=60)
        lib = ctypes.CDLL(out)
    except (OSError, subprocess.SubprocessError):
        _build_failed = True
        return None
    lib.mss_find_all.restype = ctypes.POINTER(_RefSeg)
    lib.mss_find_all.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(ctypes.c_int),
    ]
    lib._get_max.restype = ctypes.POINTER(ctypes.c_float)
    lib._get_max.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t,
    ]
    _cached_lib = lib
    return lib


def reference_mss_find_all(scores: np.ndarray, min_sc: float,
                           xdrop: float) -> List[Tuple[int, int, float]]:
    lib = load_reference_lib()
    assert lib is not None
    scores = np.ascontiguousarray(scores, dtype=np.float64)
    n_seg = ctypes.c_int()
    ptr = lib.mss_find_all(
        scores.size, scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        min_sc, xdrop, ctypes.byref(n_seg))
    segs = [(ptr[i].st, ptr[i].en, ptr[i].sc) for i in range(n_seg.value)]
    ctypes.CDLL(None).free(ptr)
    return segs


def reference_get_max(output: np.ndarray, inputs: np.ndarray,
                      stride: int) -> np.ndarray:
    lib = load_reference_lib()
    assert lib is not None
    assert output.dtype == np.float32 and inputs.dtype == np.float32
    assert output.flags.c_contiguous and inputs.flags.c_contiguous
    batch, dim0, dim1 = inputs.shape
    lib._get_max(output.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                 inputs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                 dim0, dim1, stride, batch)
    return output
