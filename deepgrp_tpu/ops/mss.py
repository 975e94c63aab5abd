"""Maximum scoring segment (Ruzzo–Tompa) post-processing, host side.

Parity with the reference's ``deepgrp.mss.find_mss_labels``
(``/root/reference/deepgrp/_mss/pymss.pyx:16-80``) and the underlying
``mss_find_all`` (``/root/reference/deepgrp/_mss/mss.c:50-101``): same score
constants (s0 = logit(0.99), min_sc = s0*min_mss_len, xdrop =
s0*xdrop_len*10 or disabled), same integer truncation of the minimum-score
threshold, same majority-vote labeling quirks (ties keep the lowest class,
in-segment background positions adopt the majority class, everything else
keeps its raw label).

The C++ implementation (``native/src/mss.cc``) is the production path; the
pure-python fallback below implements the identical algorithm and doubles as
a readable specification.
"""

from __future__ import annotations

import ctypes
import math
from typing import List, Tuple

import numpy as np

from deepgrp_tpu import native

_NEG_INF = -1e30


_DEFAULT_THREADS = 0  # 0 = auto


def set_default_threads(n: int) -> None:
    """Set the process-wide default MSS worker count (0 = auto).

    The CLI maps its ``--threads`` flag here (the reference maps the same
    flag onto TF's host thread pools, __main__.py:221-233).
    """
    global _DEFAULT_THREADS
    _DEFAULT_THREADS = int(n)


def default_threads(n: int) -> int:
    """Worker count for the exact-parallel MSS (1 below ~1 Mbp)."""
    if _DEFAULT_THREADS > 0:
        return _DEFAULT_THREADS
    if n < (1 << 20):
        return 1
    import os
    return min(os.cpu_count() or 1, 16)


def mss_find_all(scores: np.ndarray, min_score: float, xdrop: float,
                 threads: int = 0) -> np.ndarray:
    """All maximal scoring subsequences of ``scores``.

    Returns a structured array with fields ``start``, ``end`` (exclusive)
    and ``score``; only segments with score >= trunc(min_score) are
    reported (mss.c:35 truncates the threshold to int).  ``threads``
    enables the exact block-parallel implementation (0 = auto); the output
    is identical for any thread count.
    """
    scores = np.ascontiguousarray(scores, dtype=np.float64)
    lib = native.load()
    if lib is None:
        segs = _mss_find_all_py(scores, min_score, xdrop)
    else:
        if threads <= 0:
            threads = default_threads(scores.size)
        capacity = scores.size // 2 + 1
        buf = (native.DgSegment * capacity)()
        count = lib.dg_mss_find_all_mt(
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            scores.size, float(min_score), float(xdrop), threads, buf,
            capacity)
        segs = [(buf[i].start, buf[i].end, buf[i].score)
                for i in range(min(count, capacity))]
    out = np.zeros(len(segs), dtype=[("start", np.int64), ("end", np.int64),
                                     ("score", np.float64)])
    for i, (start, end, score) in enumerate(segs):
        out[i] = (start, end, score)
    return out


def find_mss_labels(scores: np.ndarray, labels: np.ndarray, nof_labels: int,
                    min_mss_len: int, xdrop_len: int,
                    threads: int = 0) -> np.ndarray:
    """Assign labels to maximum scoring segments (pymss.pyx:16-27 parity).

    Args:
        scores: per-position MSS scores, float64 ``[n]``.
        labels: per-position argmax classes, int ``[n]``.
        nof_labels: number of classes (background included).
        min_mss_len: minimal segment length (in units of the s0 score).
        xdrop_len: X-drop length; <= 0 disables the X-drop reset.
        threads: workers for the exact-parallel segment search (0 = auto;
            identical output for any value).

    Returns:
        float64 ``[n, nof_labels]`` one-hot labeling.
    """
    scores = np.ascontiguousarray(scores, dtype=np.float64)
    labels = np.ascontiguousarray(labels, dtype=np.int64)
    if scores.shape != labels.shape or scores.ndim != 1:
        raise ValueError("scores and labels must be equal-length 1-D arrays")
    out = np.zeros((scores.size, nof_labels), dtype=np.float64)
    lib = native.load()
    if lib is not None:
        if threads <= 0:
            threads = default_threads(scores.size)
        lib.dg_find_mss_labels_mt(
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            scores.size, nof_labels, min_mss_len, xdrop_len, threads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out
    _find_mss_labels_py(scores, labels, nof_labels, min_mss_len, xdrop_len,
                        out)
    return out


def find_mss_classes(scores: np.ndarray, labels: np.ndarray,
                     nof_labels: int, min_mss_len: int, xdrop_len: int,
                     threads: int = 0) -> np.ndarray:
    """As :func:`find_mss_labels` but returns the class id per position
    (``int32 [n]`` — exactly ``find_mss_labels(...).argmax(axis=1)``),
    skipping the ``[n, nof_labels]`` float64 one-hot intermediate that a
    whole-chromosome scan would allocate (8*n_labels bytes/position) and
    immediately reduce away."""
    scores = np.ascontiguousarray(scores, dtype=np.float64)
    labels = np.ascontiguousarray(labels, dtype=np.int64)
    if scores.shape != labels.shape or scores.ndim != 1:
        raise ValueError("scores and labels must be equal-length 1-D arrays")
    lib = native.load()
    if lib is not None:
        if threads <= 0:
            threads = default_threads(scores.size)
        out = np.empty(scores.size, dtype=np.int32)
        lib.dg_find_mss_classes_mt(
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            scores.size, nof_labels, min_mss_len, xdrop_len, threads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out
    one_hot = np.zeros((scores.size, nof_labels), dtype=np.float64)
    _find_mss_labels_py(scores, labels, nof_labels, min_mss_len, xdrop_len,
                        one_hot)
    return one_hot.argmax(axis=1).astype(np.int32)


class SplitScanner:
    """Incremental exact block-split detection for streaming MSS.

    Same theory as the multithreaded C++ decomposition
    (``native/src/mss_parallel.cc:1-24``): the END of any maximal
    non-positive run with cumulative drop > ``xdrop`` (and run start > 0)
    is an exact block boundary — Ruzzo-Tompa restarted there produces
    identical output.  This scanner consumes a score track incrementally
    (as pipeline slices land from the device) and reports the split
    points found so far, carrying the open-run state across feeds, so
    per-block MSS can run WHILE later slices are still in flight.

    ``min_gap`` suppresses splits closer than that many positions to the
    previous one (noisy tracks have thousands of reset points; per-block
    dispatch overhead would swamp the win).
    """

    def __init__(self, xdrop: float, min_gap: int = 1 << 18):
        self.xdrop = float(xdrop)
        self.min_gap = int(min_gap)
        self._pos = 0  # next unscanned global index
        self._run_start = -1  # global start of the open non-positive run
        self._drop = 0.0
        self._last_split = 0

    def feed(self, scores: np.ndarray, upto: int) -> List[int]:
        """Scan ``scores[pos:upto]``; return new split points (ascending).

        ``scores`` must be stable up to ``upto`` (later entries may still
        be unwritten).
        """
        lo, hi = self._pos, int(upto)
        if hi <= lo or self.xdrop <= 0.0:
            self._pos = max(self._pos, hi)
            return []
        region = scores[lo:hi]
        pos_mask = region > 0.0
        # Maximal non-positive run boundaries within the region, fully
        # vectorized (a noisy 2 Mbp track has ~200k runs — any per-run
        # python loop here would dwarf the MSS itself).  Index 0 counts
        # as a run start via the prepended sentinel; the carry logic
        # below overrides it when a run is open across the feed boundary.
        run_starts = np.flatnonzero(
            ~pos_mask & np.concatenate([[True], pos_mask[:-1]]))
        run_end_markers = np.flatnonzero(
            pos_mask & np.concatenate([[True], ~pos_mask[:-1]]))
        drops = np.cumsum(np.where(pos_mask, 0.0, -region.astype(np.float64)))

        splits: List[int] = []
        carry_start = self._run_start
        carry_drop = self._drop
        carried_first = carry_start >= 0
        if carried_first:
            # The open run continues at region offset 0 (or ends at the
            # first positive position).
            if pos_mask[0]:
                self._maybe_split(splits, carry_start, carry_drop, lo)
                carried_first = False
                carry_start, carry_drop = -1, 0.0
            else:
                nxt = run_end_markers[run_end_markers > 0]
                if nxt.size:
                    e_local = int(nxt[0])
                    total = carry_drop + float(drops[e_local - 1])
                    self._maybe_split(splits, carry_start, total,
                                      lo + e_local)
                    carried_first = False
                    carry_start, carry_drop = -1, 0.0
                else:  # run spans the whole region
                    carry_drop += float(drops[-1]) if region.size else 0.0
                    self._run_start, self._drop = carry_start, carry_drop
                    self._pos = hi
                    return splits
        if run_starts.size and run_starts[0] == 0 and self._run_start >= 0:
            run_starts = run_starts[1:]  # handled as carry above
        # Pair each run with its end (the first positive index after it);
        # the final run may be open at the region end -> carried.
        ends_idx = np.searchsorted(run_end_markers, run_starts,
                                   side="right")
        open_last = run_starts.size and ends_idx[-1] >= run_end_markers.size
        if open_last:
            s_local = int(run_starts[-1])
            carry_start = lo + s_local
            carry_drop = float(drops[-1] -
                               (drops[s_local - 1] if s_local else 0.0))
            run_starts = run_starts[:-1]
            ends_idx = ends_idx[:-1]
        else:
            carry_start, carry_drop = -1, 0.0
        if run_starts.size:
            run_ends = run_end_markers[ends_idx]
            run_drops = (drops[run_ends - 1] -
                         np.where(run_starts > 0,
                                  drops[np.maximum(run_starts - 1, 0)],
                                  0.0))
            margin = 1e-6 * max(1.0, abs(self.xdrop))
            qualifies = (run_drops > self.xdrop + margin) & (
                (lo + run_starts) > 0)
            # min_gap greedy selection over the (few) qualifying resets.
            for e_local in run_ends[qualifies]:
                end_global = lo + int(e_local)
                if end_global - self._last_split >= self.min_gap:
                    splits.append(end_global)
                    self._last_split = end_global
        self._run_start, self._drop = carry_start, carry_drop
        self._pos = hi
        return splits

    def _maybe_split(self, splits: List[int], run_start_global: int,
                     drop: float, end_global: int) -> None:
        # Strict margin: the split is valid only if the X-drop reset
        # PROVABLY fires inside the run under the DP's own sequential
        # arithmetic; a vectorized cumsum can differ by a few ulps, so a
        # borderline drop==xdrop run is not split.
        margin = 1e-6 * max(1.0, abs(self.xdrop))
        if (run_start_global > 0 and drop > self.xdrop + margin
                and end_global - self._last_split >= self.min_gap):
            splits.append(end_global)
            self._last_split = end_global


def streaming_mss_block_classes(scores: np.ndarray, labels: np.ndarray,
                                out: np.ndarray, lo: int, hi: int,
                                nof_labels: int, min_mss_len: int,
                                xdrop_len: int) -> None:
    """Label one independent block ``[lo, hi)`` into ``out`` (int32).

    Exactness: ``lo``/``hi`` must be 0/len or SplitScanner split points.
    Runs single-threaded — the streaming driver parallelizes across
    blocks, so per-block thread fan-out would only add overhead.
    """
    out[lo:hi] = find_mss_classes(scores[lo:hi], labels[lo:hi],
                                  nof_labels, min_mss_len, xdrop_len,
                                  threads=1)


def _mss_find_all_py(scores: np.ndarray, min_score: float,
                     xdrop: float) -> List[Tuple[int, int, float]]:
    """Pure-python Ruzzo–Tompa with X-drop; specification fallback."""
    min_sc = float(int(min_score))  # reference truncates to int (mss.c:35)
    out: List[Tuple[int, int, float]] = []
    # Candidate entries: [start, end, lprefix, rprefix, back_pointer]
    cands: List[list] = []

    def flush() -> None:
        for start, end, lpre, rpre, _ in cands:
            if rpre - lpre >= min_sc:
                out.append((start, end, rpre - lpre))
        cands.clear()

    n = scores.size
    prefix = 0.0
    best = _NEG_INF
    i = 0
    while i < n:
        if scores[i] > 0.0:
            end = i
            rpre = prefix
            while end < n and scores[end] > 0.0:
                rpre += scores[end]
                end += 1
            best = max(best, rpre)
            cur = [i, end, prefix, rpre, -1]
            while True:
                j = len(cands) - 1
                while j >= 0:
                    if cands[j][2] < cur[2]:
                        break
                    j = cands[j][4] if cands[j][4] >= 0 else j - 1
                if j >= 0 and cands[j][3] < cur[3]:
                    cur[0], cur[2], cur[4] = cands[j][0], cands[j][2], cands[j][4]
                    del cands[j:]
                    continue
                if j < 0:
                    flush()
                    best = rpre
                cur[4] = j
                cands.append(cur)
                break
            prefix = rpre
            i = end
        else:
            if xdrop > 0.0 and prefix + scores[i] + xdrop < best:
                flush()
                prefix = 0.0
                best = _NEG_INF
            prefix += scores[i]
            i += 1
    flush()
    return out


def _find_mss_labels_py(scores: np.ndarray, labels: np.ndarray,
                        nof_labels: int, min_mss_len: int, xdrop_len: int,
                        out: np.ndarray) -> None:
    s0 = math.log(0.99 / (1.0 - 0.99))
    min_sc = s0 * min_mss_len
    xdrop = s0 * xdrop_len * 10.0 if xdrop_len > 0 else -1.0
    segs = _mss_find_all_py(scores, min_sc, xdrop)
    cursor = 0
    rng = np.arange(scores.size)
    for start, end, _ in segs:
        counts = np.bincount(labels[start:end], minlength=nof_labels)
        major = 1 + int(np.argmax(counts[1:]))  # ties -> lowest class
        seg_labels = labels[start:end]
        out[rng[start:end], np.where(seg_labels == 0, major, seg_labels)] = 1.0
        out[rng[cursor:start], labels[cursor:start]] = 1.0
        cursor = end
    out[rng[cursor:], labels[cursor:]] = 1.0
