"""On-device (jittable) maximum-scoring-segment search + labeling.

The all-on-chip formulation of the reference's Ruzzo-Tompa MSS post-
processing (``/root/reference/deepgrp/_mss/mss.c:50-101`` and
``_mss/pymss.pyx:16-80``), complementing the production C++ host path in
:mod:`deepgrp_tpu.ops.mss`.  Used when the merged window scores already
live in HBM (e.g. the sharded chunk-scan engine) and a host round-trip for
post-processing is undesirable.

Algorithm (exact, not approximate):

1. **Vectorized run collapse.**  Ruzzo-Tompa treats each maximal positive
   run as one atomic candidate (mss.c:62-70 consumes a whole ``S[i] > 0``
   stretch per iteration).  We compute run ids with a cumsum over run-start
   marks, run boundaries with ``segment_min``/``segment_max`` and the
   candidate (L, R) prefix pair from one global ``cumsum`` -- all dense VPU
   work, no sequential dependence.

2. **Shift-invariant X-drop resets.**  The X-drop reset (mss.c:89-92) can
   only fire inside a non-positive gap, fires in a given gap iff
   ``prefix_at_gap_end + xdrop < best`` (the in-gap prefix is monotone
   non-increasing, so the first crossing exists iff the gap-end value
   crosses), and the reset *position* inside the gap only shifts the prefix
   frame by a constant, which provably cannot change any emitted segment
   (see ``native/src/mss_parallel.cc:1-23`` for the proof sketch).  We
   therefore place every reset at the following run's start, where the new
   frame offset is simply the global prefix at that run start.

3. **Sequential candidate-stack scan over runs.**  A ``lax.while_loop``
   with a *dynamic* trip count (= number of positive runs, usually orders
   of magnitude below sequence length) replays the reference's candidate
   stack exactly: back-pointer search (pymss/mss.c step 1), merge
   (mss.c:78-84), flush-on-new-minimum (mss.c:72-76 semantics as in the
   python spec ``ops/mss.py:_mss_find_all_py``), including the
   integer-truncated ``min_score`` threshold (mss.c:35).

Numerics: prefix sums use one parallel ``cumsum`` instead of the
reference's sequential accumulation, so float rounding can differ by a few
ulps; with float64 (or integer-valued / dyadic scores in float32) the
output is bit-identical to the C++ library -- tests enforce this.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_NEG_INF = -1e30


class DeviceSegments(NamedTuple):
    """Padded segment set: only the first ``count`` rows are valid."""

    starts: jax.Array  # int32 [capacity]
    ends: jax.Array  # int32 [capacity], exclusive
    scores: jax.Array  # score dtype [capacity]
    count: jax.Array  # int32 scalar
    overflow: jax.Array  # bool scalar: capacity was insufficient


def _emit(c: dict, st, en, val, min_sc, capacity: int) -> dict:
    """Append one segment if it clears the (truncated) score threshold."""
    ok = (val >= min_sc) & (c["n_out"] < capacity)
    i = jnp.where(ok, c["n_out"], 0)
    return {
        **c,
        "oS": c["oS"].at[i].set(jnp.where(ok, st, c["oS"][i])),
        "oE": c["oE"].at[i].set(jnp.where(ok, en, c["oE"][i])),
        "oV": c["oV"].at[i].set(jnp.where(ok, val, c["oV"][i])),
        "n_out": c["n_out"] + ok.astype(jnp.int32),
    }


def _flush(c: dict, min_sc, capacity: int) -> dict:
    """Emit all pending candidates bottom-up and clear the stack."""

    def body(kc):
        k, c = kc
        val = c["stR"][k] - c["stL"][k]
        return k + 1, _emit(c, c["stS"][k], c["stE"][k], val, min_sc,
                            capacity)

    _, c = lax.while_loop(lambda kc: kc[0] < kc[1]["top"], body,
                          (jnp.int32(0), c))
    return {**c, "top": jnp.int32(0)}


@functools.partial(jax.jit, static_argnames=("max_runs",))
def mss_find_all_device(scores: jax.Array, min_score, xdrop, *,
                        max_runs: int) -> DeviceSegments:
    """All maximal scoring subsequences, entirely on device.

    Exact equivalent of ``ops.mss.mss_find_all`` (mss.c:50-101 parity,
    including the int-truncated threshold).  ``max_runs`` bounds the number
    of positive runs (and the candidate stack / output); if the input has
    more runs the result sets ``overflow`` and must not be trusted --
    use :func:`count_positive_runs` or the auto wrapper to size it.

    Args:
        scores: per-position scores ``[n]`` (float; use float64 / exactly
            representable values for bit parity with the host library).
        min_score: minimal reported segment score (truncated to int).
        xdrop: X-drop reset threshold; <= 0 disables resets.
        max_runs: static capacity for positive runs.
    """
    n = scores.shape[0]
    dtype = scores.dtype
    capacity = max_runs
    if n == 0:
        zero = jnp.int32(0)
        return DeviceSegments(jnp.zeros(capacity, jnp.int32),
                              jnp.zeros(capacity, jnp.int32),
                              jnp.zeros(capacity, dtype), zero,
                              jnp.array(False))

    min_sc = jnp.trunc(jnp.asarray(min_score, dtype))  # mss.c:35
    xdrop = jnp.asarray(xdrop, dtype)
    neg = jnp.asarray(_NEG_INF, dtype)

    idx = jnp.arange(n, dtype=jnp.int32)
    pos = scores > 0
    run_mark = pos & ~jnp.concatenate(
        [jnp.zeros((1,), bool), pos[:-1]])
    rid = jnp.cumsum(run_mark.astype(jnp.int32))
    n_runs = rid[-1]
    overflow = n_runs > max_runs
    seg_id = jnp.where(pos, rid, 0)  # bucket 0 absorbs non-positive
    starts = jax.ops.segment_min(jnp.where(pos, idx, n), seg_id,
                                 num_segments=max_runs + 1)[1:]
    ends = jax.ops.segment_max(jnp.where(pos, idx, -1), seg_id,
                               num_segments=max_runs + 1)[1:] + 1

    prefix = jnp.cumsum(scores)
    prefix_excl = prefix - scores
    l_glob = prefix_excl[jnp.clip(starts, 0, n - 1)]
    r_glob = prefix[jnp.clip(ends - 1, 0, n - 1)]

    init = dict(
        r=jnp.int32(0),
        shift=jnp.asarray(0, dtype),
        best=neg,
        top=jnp.int32(0),
        stL=jnp.zeros(max_runs, dtype),
        stR=jnp.zeros(max_runs, dtype),
        stS=jnp.zeros(max_runs, jnp.int32),
        stE=jnp.zeros(max_runs, jnp.int32),
        stB=jnp.zeros(max_runs, jnp.int32),
        oS=jnp.zeros(capacity, jnp.int32),
        oE=jnp.zeros(capacity, jnp.int32),
        oV=jnp.zeros(capacity, dtype),
        n_out=jnp.int32(0),
    )

    def run_body(c):
        r = c["r"]
        # X-drop reset in the gap before this run (shift-invariant
        # placement at the run start; see module docstring, point 2).
        fire = (xdrop > 0) & (l_glob[r] - c["shift"] + xdrop < c["best"])

        def do_reset(c):
            c = _flush(c, min_sc, capacity)
            return {**c, "shift": l_glob[r], "best": neg}

        c = lax.cond(fire, do_reset, lambda c: c, c)

        cur_l = l_glob[r] - c["shift"]
        cur_r = r_glob[r] - c["shift"]
        c = {**c, "best": jnp.maximum(c["best"], cur_r)}

        m0 = dict(c=c, st=starts[r], en=ends[r], L=cur_l, R=cur_r,
                  done=jnp.array(False))

        def mbody(m):
            c = m["c"]
            # Back-pointer search: nearest candidate below the top with a
            # strictly smaller left prefix (pymss/mss.c chain semantics).
            j = lax.while_loop(
                lambda j: (j >= 0) & ~(c["stL"][j] < m["L"]),
                lambda j: jnp.where(c["stB"][j] >= 0, c["stB"][j], j - 1),
                c["top"] - 1)
            can_merge = (j >= 0) & (c["stR"][j] < m["R"])

            def do_merge(m):
                c = m["c"]
                return dict(m, st=c["stS"][j], L=c["stL"][j],
                            c={**c, "top": j})

            def do_push(m):
                c = m["c"]

                def new_minimum(c):
                    # No candidate with a smaller prefix: everything
                    # pending is final; the running max restarts at R.
                    c = _flush(c, min_sc, capacity)
                    return {**c, "best": m["R"]}

                c = lax.cond(j < 0, new_minimum, lambda c: c, c)
                t = c["top"]
                c = {
                    **c,
                    "stL": c["stL"].at[t].set(m["L"]),
                    "stR": c["stR"].at[t].set(m["R"]),
                    "stS": c["stS"].at[t].set(m["st"]),
                    "stE": c["stE"].at[t].set(m["en"]),
                    "stB": c["stB"].at[t].set(j),
                    "top": t + 1,
                }
                return dict(m, c=c, done=jnp.array(True))

            return lax.cond(can_merge, do_merge, do_push, m)

        m = lax.while_loop(lambda m: ~m["done"], mbody, m0)
        return {**m["c"], "r": r + 1}

    c = lax.while_loop(lambda c: c["r"] < jnp.minimum(n_runs, max_runs),
                       run_body, init)
    c = _flush(c, min_sc, capacity)
    return DeviceSegments(c["oS"], c["oE"], c["oV"], c["n_out"], overflow)


@functools.partial(jax.jit,
                   static_argnames=("nof_labels", "min_mss_len",
                                    "xdrop_len", "max_runs"))
def mss_classes_device(scores: jax.Array, labels: jax.Array,
                       nof_labels: int, min_mss_len: int, xdrop_len: int, *,
                       max_runs: int) -> tuple[jax.Array, jax.Array]:
    """Per-position class after MSS labeling, entirely on device.

    Equals ``find_mss_labels(...).argmax(axis=1)`` of the host library
    (pymss.pyx:16-80): same score constants (s0 = logit(0.99), min_sc =
    s0*min_mss_len, xdrop = s0*xdrop_len*10 or disabled) and labeling
    quirks (majority vote over classes 1..n with lowest-class ties,
    in-segment background adoption, raw labels elsewhere).  Memory stays
    O(n) int32 (per-class counts use ``segment_sum``, never an
    ``[n, nof_labels]`` matrix), so chromosome-scale inputs fit in HBM.

    Returns ``(classes int32 [n], overflow flag)``; on overflow re-run
    with a larger ``max_runs`` (or fall back to host).
    """
    s0 = math.log(0.99 / (1.0 - 0.99))
    min_sc = s0 * min_mss_len
    xdrop = s0 * xdrop_len * 10.0 if xdrop_len > 0 else -1.0
    segs = mss_find_all_device(scores, min_sc, xdrop, max_runs=max_runs)

    n = scores.shape[0]
    capacity = segs.starts.shape[0]
    labels = labels.astype(jnp.int32)
    valid = jnp.arange(capacity, dtype=jnp.int32) < segs.count

    # Map positions to their covering segment (segments are emitted in
    # ascending-start order and are disjoint; sort defensively anyway).
    sort_starts = jnp.where(valid, segs.starts, n)
    order = jnp.argsort(sort_starts)
    sstarts = sort_starts[order]
    sends = jnp.where(valid, segs.ends, n)[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    sid = jnp.searchsorted(sstarts, idx, side="right").astype(jnp.int32) - 1
    sid_c = jnp.clip(sid, 0, capacity - 1)
    in_seg = (sid >= 0) & (idx < sends[sid_c])

    # Majority class per segment: per-class position counts keyed by the
    # (sorted) segment id; out-of-segment positions go to a spill bucket.
    seg_key = jnp.where(in_seg, sid_c, capacity)
    counts = jnp.stack([
        jax.ops.segment_sum(
            ((labels == c) & in_seg).astype(jnp.int32), seg_key,
            num_segments=capacity + 1)[:capacity]
        for c in range(1, nof_labels)
    ])  # [nof_labels-1, capacity]
    smajor = 1 + jnp.argmax(counts, axis=0).astype(jnp.int32)  # ties: lowest

    assigned = jnp.where(in_seg & (labels == 0), smajor[sid_c], labels)
    return assigned, segs.overflow


@functools.partial(jax.jit,
                   static_argnames=("nof_labels", "min_mss_len",
                                    "xdrop_len", "max_runs"))
def find_mss_labels_device(scores: jax.Array, labels: jax.Array,
                           nof_labels: int, min_mss_len: int,
                           xdrop_len: int, *,
                           max_runs: int) -> tuple[jax.Array, jax.Array]:
    """On-device ``find_mss_labels`` (pymss.pyx:16-80 parity).

    One-hot wrapper over :func:`mss_classes_device`; returns
    ``(one_hot [n, nof_labels], overflow flag)``.
    """
    assigned, overflow = mss_classes_device(scores, labels, nof_labels,
                                            min_mss_len, xdrop_len,
                                            max_runs=max_runs)
    return jax.nn.one_hot(assigned, nof_labels, dtype=scores.dtype), overflow


@functools.partial(jax.jit,
                   static_argnames=("nof_labels", "min_mss_len",
                                    "xdrop_len", "max_runs"))
def mss_classes_from_scored(classes: jax.Array, maxp: jax.Array,
                            out_len: jax.Array, nof_labels: int,
                            min_mss_len: int, xdrop_len: int, *,
                            max_runs: int) -> tuple[jax.Array, jax.Array]:
    """All-on-chip ``apply_mss``: engine-scored (argmax, max-prob) arrays ->
    per-position MSS classes, without leaving the device.

    The score transform matches prediction.py:51-57 (float32: ``t =
    log(p/(1-p))`` with ``p = min(max_prob + 1e-6, 0.99)``; ``+t`` for
    repeat argmax, ``-10t`` for background).  Rows at/after ``out_len``
    (the engine's bucketed padding) are neutralized to score 0 / label 0
    so they cannot join or trigger anything.
    """
    idx = jnp.arange(classes.shape[0], dtype=jnp.int32)
    in_len = idx < out_len
    labels = jnp.where(in_len, classes.astype(jnp.int32), 0)
    mins = jnp.minimum(maxp.astype(jnp.float32) + jnp.float32(1e-6),
                       jnp.float32(0.99))
    t_scores = jnp.log(mins / (1 - mins))
    scores = jnp.where(labels > 0, t_scores, -10 * t_scores)
    scores = jnp.where(in_len, scores, 0.0)
    return mss_classes_device(scores, labels, nof_labels, min_mss_len,
                              xdrop_len, max_runs=max_runs)


# -- hybrid host-stack route -------------------------------------------------
#
# The pure-device MSS above is exact but its candidate-stack while-loop is
# LATENCY-bound on TPU (~0.5 ms per positive run measured on v5e: tiny
# dynamic-slice ops dominate each iteration).  The production route
# therefore splits the work by nature: the RUN COLLAPSE (dense cumsum /
# segment reductions over the whole track) stays on device, the candidate
# arrays — 16 bytes per positive run, i.e. ~10 KB for a trained 2 Mbp
# track — cross to the host in ONE packed fetch, the inherently
# sequential stack scan runs as host scalar code (microseconds), and the
# final majority-vote labeling runs dense on device again.  Bit-identical
# to :func:`mss_find_all_device` (same f32 prefix frame, same reset
# placement; the host scan replicates run_body exactly).


def _scored_to_scores(classes: jax.Array, maxp: jax.Array,
                      out_len) -> tuple[jax.Array, jax.Array]:
    """Reference score transform + padding neutralization (f32)."""
    idx = jnp.arange(classes.shape[0], dtype=jnp.int32)
    in_len = idx < out_len
    labels = jnp.where(in_len, classes.astype(jnp.int32), 0)
    mins = jnp.minimum(maxp.astype(jnp.float32) + jnp.float32(1e-6),
                       jnp.float32(0.99))
    t_scores = jnp.log(mins / (1 - mins))
    scores = jnp.where(labels > 0, t_scores, -10 * t_scores)
    return jnp.where(in_len, scores, 0.0), labels


@functools.partial(jax.jit, static_argnames=("capacity",))
def collapse_candidates_packed(classes: jax.Array, maxp: jax.Array,
                               out_len, *, capacity: int) -> jax.Array:
    """Device run collapse -> ONE packed uint8 buffer for the host stack.

    Layout: ``[runs i32 | overflow i32 | starts i32[c] | ends i32[c] |
    l f32[c] | r f32[c]]`` bitcast to bytes — a single device->host fetch
    delivers the candidate set AND the routing decision.  ``l``/``r`` are
    the global f32 prefix pair of each positive run (the exact values
    :func:`mss_find_all_device` uses), so a host stack scan over them
    reproduces the device result bit-for-bit.
    """
    scores, _ = _scored_to_scores(classes, maxp, out_len)
    n = scores.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    pos = scores > 0
    run_mark = pos & ~jnp.concatenate([jnp.zeros((1,), bool), pos[:-1]])
    rid = jnp.cumsum(run_mark.astype(jnp.int32))
    n_runs = rid[-1]
    overflow = (n_runs > capacity).astype(jnp.int32)
    seg_id = jnp.where(pos, rid, 0)
    starts = jax.ops.segment_min(jnp.where(pos, idx, n), seg_id,
                                 num_segments=capacity + 1)[1:]
    ends = jax.ops.segment_max(jnp.where(pos, idx, -1), seg_id,
                               num_segments=capacity + 1)[1:] + 1
    prefix = jnp.cumsum(scores)
    prefix_excl = prefix - scores
    l_glob = prefix_excl[jnp.clip(starts, 0, n - 1)].astype(jnp.float32)
    r_glob = prefix[jnp.clip(ends - 1, 0, n - 1)].astype(jnp.float32)
    head = jnp.stack([n_runs, overflow]).astype(jnp.int32)
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(head, jnp.uint8).reshape(-1),
        jax.lax.bitcast_convert_type(starts, jnp.uint8).reshape(-1),
        jax.lax.bitcast_convert_type(ends, jnp.uint8).reshape(-1),
        jax.lax.bitcast_convert_type(l_glob, jnp.uint8).reshape(-1),
        jax.lax.bitcast_convert_type(r_glob, jnp.uint8).reshape(-1),
    ])


def unpack_candidates(buf: np.ndarray, capacity: int):
    """Host inverse of :func:`collapse_candidates_packed`."""
    head = buf[:8].view(np.int32)
    n_runs, overflow = int(head[0]), bool(head[1])
    off = 8
    starts = buf[off:off + 4 * capacity].view(np.int32)
    off += 4 * capacity
    ends = buf[off:off + 4 * capacity].view(np.int32)
    off += 4 * capacity
    l_glob = buf[off:off + 4 * capacity].view(np.float32)
    off += 4 * capacity
    r_glob = buf[off:off + 4 * capacity].view(np.float32)
    return n_runs, overflow, starts, ends, l_glob, r_glob


def mss_stack_from_candidates(starts, ends, l_glob, r_glob, n_runs: int,
                              min_score: float, xdrop: float):
    """Host replica of the device candidate-stack scan (run_body above).

    Operates on the collapsed positive runs in np.float32 (the same
    frame-shifted arithmetic as :func:`mss_find_all_device`), so the
    emitted segments are identical to the all-on-chip path.  Sequential
    scalar work — microseconds for trained-track run counts.

    Returns ``(seg_starts, seg_ends)`` int lists in emission order.
    """
    f32 = np.float32
    min_sc = f32(np.trunc(f32(min_score)))  # mss.c:35
    xdrop = f32(xdrop)
    neg = f32(_NEG_INF)
    out_s: list = []
    out_e: list = []
    # Candidate stack: lists of (L, R, start, end, back_ptr)
    stL: list = []
    stR: list = []
    stS: list = []
    stE: list = []
    stB: list = []

    def flush():
        for k in range(len(stL)):
            val = f32(stR[k] - stL[k])
            if val >= min_sc:
                out_s.append(stS[k])
                out_e.append(stE[k])
        stL.clear()
        stR.clear()
        stS.clear()
        stE.clear()
        stB.clear()

    shift = f32(0.0)
    best = neg
    for rix in range(n_runs):
        lg = f32(l_glob[rix])
        rg = f32(r_glob[rix])
        if xdrop > 0 and f32(lg - shift + xdrop) < best:
            flush()
            shift = lg
            best = neg
        cur_l = f32(lg - shift)
        cur_r = f32(rg - shift)
        if cur_r > best:
            best = cur_r
        st, en = int(starts[rix]), int(ends[rix])
        while True:
            j = len(stL) - 1
            while j >= 0 and not (stL[j] < cur_l):
                j = stB[j] if stB[j] >= 0 else j - 1
            if j >= 0 and stR[j] < cur_r:
                st = stS[j]
                cur_l = stL[j]
                del stL[j:], stR[j:], stS[j:], stE[j:], stB[j:]
                continue
            if j < 0:
                flush()
                best = cur_r
            stL.append(cur_l)
            stR.append(cur_r)
            stS.append(st)
            stE.append(en)
            stB.append(j)
            break
    flush()
    return out_s, out_e


@functools.partial(jax.jit, static_argnames=("nof_labels", "capacity"))
def assign_segment_classes(classes: jax.Array, out_len, segbuf: jax.Array,
                           *, nof_labels: int, capacity: int) -> jax.Array:
    """Device majority-vote labeling for host-provided segments -> uint8.

    The labeling half of :func:`mss_classes_device` (pymss.pyx:46-67
    semantics: majority over classes 1..n with lowest-class ties,
    in-segment background adoption, raw labels elsewhere), applied to
    the host stack scan's packed segment buffer ``int32 [1 + 2*capacity]
    = [count | starts | ends]`` (one host->device upload on slow links).
    """
    count = segbuf[0]
    sstarts = segbuf[1:1 + capacity]
    sends = segbuf[1 + capacity:]
    n = classes.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    labels = jnp.where(idx < out_len, classes.astype(jnp.int32), 0)
    valid = jnp.arange(capacity, dtype=jnp.int32) < count
    sort_starts = jnp.where(valid, sstarts, n)
    order = jnp.argsort(sort_starts)
    sstarts_s = sort_starts[order]
    sends_s = jnp.where(valid, sends, n)[order]
    sid = jnp.searchsorted(sstarts_s, idx,
                           side="right").astype(jnp.int32) - 1
    sid_c = jnp.clip(sid, 0, capacity - 1)
    in_seg = (sid >= 0) & (idx < sends_s[sid_c])
    seg_key = jnp.where(in_seg, sid_c, capacity)
    counts = jnp.stack([
        jax.ops.segment_sum(
            ((labels == c) & in_seg).astype(jnp.int32), seg_key,
            num_segments=capacity + 1)[:capacity]
        for c in range(1, nof_labels)
    ])
    smajor = 1 + jnp.argmax(counts, axis=0).astype(jnp.int32)
    assigned = jnp.where(in_seg & (labels == 0), smajor[sid_c], labels)
    return assigned.astype(jnp.uint8)


def count_positive_runs(scores) -> int:
    """Number of maximal positive runs (to size ``max_runs``)."""
    pos = jnp.asarray(scores) > 0
    if pos.shape[0] == 0:
        return 0
    run_mark = pos & ~jnp.concatenate([jnp.zeros((1,), bool), pos[:-1]])
    return int(jnp.sum(run_mark.astype(jnp.int32)))


def find_mss_labels_auto(scores, labels, nof_labels: int, min_mss_len: int,
                         xdrop_len: int,
                         max_runs: Optional[int] = None) -> np.ndarray:
    """Convenience wrapper: size ``max_runs`` from the data (rounded up to
    a power of two to bound recompiles), run on device, return numpy."""
    if max_runs is None:
        runs = count_positive_runs(scores)
        max_runs = max(16, 1 << max(runs - 1, 1).bit_length())
    out, overflow = find_mss_labels_device(jnp.asarray(scores),
                                           jnp.asarray(labels), nof_labels,
                                           min_mss_len, xdrop_len,
                                           max_runs=max_runs)
    if bool(overflow):
        raise ValueError(f"max_runs={max_runs} insufficient; "
                         "increase capacity")
    return np.asarray(out)
