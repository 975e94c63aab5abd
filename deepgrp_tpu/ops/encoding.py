"""DNA sequence one-hot encoding (host side).

Behavioral parity with the reference Cython module
(``/root/reference/deepgrp/sequence.pyx:11-36,55-58``): ASCII bases map
through a lookup table A->0 C->1 G->2 T->3 other->4 (both cases), leading
and trailing ``'N'`` characters are trimmed, and the result is an
``int8[5, length]`` one-hot array plus the trim start position.

The hot loop runs in C++ (``native/src/encode.cc``) when available; the
numpy fallback is fully vectorized.
"""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from deepgrp_tpu import native

# 256-entry ASCII -> channel lookup (reference uses a 128-entry table,
# sequence.pyx:11-17; bytes >= 128 also map to 4 here).
_LUT = np.full(256, 4, dtype=np.int8)
for _base, _code in (("Aa", 0), ("Cc", 1), ("Gg", 2), ("Tt", 3)):
    for _ch in _base:
        _LUT[ord(_ch)] = _code


def one_hot_encode_dna_sequence(sequence: str) -> Tuple[int, np.ndarray]:
    """One-hot encode ``sequence``, dropping leading and trailing N's.

    Returns:
        (startpos, fwd): number of leading N's dropped and the
        ``int8[5, trimmed_length]`` one-hot encoding.
    """
    raw = sequence.encode("utf-8")
    lib = native.load()
    if lib is not None:
        return _encode_native(lib, raw)
    return _encode_numpy(raw)


def _encode_native(lib: ctypes.CDLL, raw: bytes) -> Tuple[int, np.ndarray]:
    n = len(raw)
    start = ctypes.c_int64()
    end = ctypes.c_int64()
    lib.dg_trim_n(raw, n, ctypes.byref(start), ctypes.byref(end))
    length = end.value - start.value
    out = np.zeros((5, length), dtype=np.int8)
    if length:
        lib.dg_one_hot_encode(
            raw[start.value:end.value], length,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return start.value, out


def _encode_numpy(raw: bytes) -> Tuple[int, np.ndarray]:
    codes = _LUT[np.frombuffer(raw, dtype=np.uint8)]
    is_n = np.frombuffer(raw, dtype=np.uint8) == ord("N")
    start = 0
    end = codes.size
    if is_n.all():
        return codes.size, np.zeros((5, 0), dtype=np.int8)
    if codes.size:
        start = int(np.argmin(is_n))
        end = codes.size - int(np.argmin(is_n[::-1]))
    codes = codes[start:end]
    out = np.zeros((5, codes.size), dtype=np.int8)
    out[codes, np.arange(codes.size)] = 1
    return start, out


def encode_codes(sequence: str) -> np.ndarray:
    """Encode a sequence to integer channel codes (no trimming, no one-hot).

    Utility for device-side pipelines that prefer the compact ``int8[length]``
    code representation over the 5-row one-hot.
    """
    return _LUT[np.frombuffer(sequence.encode("utf-8"), dtype=np.uint8)]


def encode_codes_trimmed(sequence: str) -> Tuple[int, np.ndarray]:
    """Trimmed compact encoding: ``(startpos, codes int8[length])``.

    Same N-trimming as :func:`one_hot_encode_dna_sequence` (so
    ``one_hot[c, i] == (codes[i] == c)`` and startpos matches), but 5x
    smaller — the production engine expands codes to one-hot *on device*,
    cutting the host->device transfer of a chromosome scan by 5x.
    """
    raw = sequence.encode("utf-8")
    lib = native.load()
    if lib is not None:
        start = ctypes.c_int64()
        end = ctypes.c_int64()
        lib.dg_trim_n(raw, len(raw), ctypes.byref(start), ctypes.byref(end))
        lo, hi = start.value, end.value
    else:
        is_n = np.frombuffer(raw, dtype=np.uint8) == ord("N")
        if is_n.all():
            return len(raw), np.zeros(0, dtype=np.int8)
        lo = int(np.argmin(is_n)) if is_n.size else 0
        hi = is_n.size - int(np.argmin(is_n[::-1])) if is_n.size else 0
    codes = _LUT[np.frombuffer(raw, dtype=np.uint8)[lo:hi]]
    return lo, codes
