"""Native host library loader.

Compiles (lazily, once) and loads ``libdeepgrp_native.so`` from the C++
sources in ``deepgrp_tpu/native/src``.  Every entry point has a pure-numpy
fallback in :mod:`deepgrp_tpu.ops`, so the package works without a C++
toolchain; the native path is used automatically when available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

_LOG = logging.getLogger(__name__)

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libdeepgrp_native.so")
_SOURCES = ("mss.cc", "mss_parallel.cc", "encode.cc")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


class DgSegment(ctypes.Structure):
    """Mirror of the C ``DgSegment`` struct."""

    _fields_ = [
        ("start", ctypes.c_int64),
        ("end", ctypes.c_int64),
        ("score", ctypes.c_double),
    ]


def _compile() -> bool:
    sources = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
    cmd = [
        "g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-march=native",
        "-pthread", "-o", _LIB_PATH, *sources,
    ]
    try:
        result = subprocess.run(cmd, capture_output=True, text=True,
                                timeout=120, check=False)
    except (OSError, subprocess.TimeoutExpired) as err:
        _LOG.warning("native build failed to run: %s", err)
        return False
    if result.returncode != 0:
        _LOG.warning("native build failed:\n%s", result.stderr)
        return False
    return True


def _needs_rebuild() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    return any(
        os.path.getmtime(os.path.join(_SRC_DIR, s)) > lib_mtime
        for s in _SOURCES)


def _declare(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.dg_mss_find_all.restype = ctypes.c_int64
    lib.dg_mss_find_all.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(DgSegment), ctypes.c_int64,
    ]
    lib.dg_find_mss_labels.restype = None
    lib.dg_find_mss_labels.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.dg_mss_find_all_mt.restype = ctypes.c_int64
    lib.dg_mss_find_all_mt.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, ctypes.c_int32, ctypes.POINTER(DgSegment),
        ctypes.c_int64,
    ]
    lib.dg_find_mss_labels_mt.restype = None
    lib.dg_find_mss_labels_mt.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_double),
    ]
    lib.dg_find_mss_classes_mt.restype = None
    lib.dg_find_mss_classes_mt.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.dg_trim_n.restype = None
    lib.dg_trim_n.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.dg_one_hot_encode.restype = None
    lib.dg_one_hot_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int8),
    ]
    lib.dg_overlap_max.restype = None
    lib.dg_overlap_max.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t,
    ]
    return lib


def load() -> Optional[ctypes.CDLL]:
    """Return the native library, building it on first use; None on failure."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if os.environ.get("DEEPGRP_TPU_NO_NATIVE"):
            _load_failed = True
            return None
        try:
            if _needs_rebuild() and not _compile():
                _load_failed = True
                return None
            _lib = _declare(ctypes.CDLL(_LIB_PATH))
        except OSError as err:
            _LOG.warning("could not load native library: %s", err)
            _load_failed = True
            return None
    return _lib


def available() -> bool:
    """True when the native library loads (builds) successfully."""
    return load() is not None
