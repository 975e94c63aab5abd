"""MSS (Ruzzo–Tompa + X-drop + labeling) parity tests.

Oracles: the reference's own mss.c compiled from /root/reference (bit
parity), plus the pure-python specification fallback.
"""

import math

import numpy as np
import pytest

from deepgrp_tpu import native
from deepgrp_tpu.ops import mss

from reference_oracle import load_reference_lib, reference_mss_find_all

S0 = math.log(0.99 / 0.01)


def random_scores(rng, n):
    """Score vectors shaped like apply_mss output: +t for repeats, -10t bg."""
    t = rng.uniform(0.1, S0, size=n)
    sign = rng.random(n) < 0.3
    return np.where(sign, t, -10 * t)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("min_len,xdrop_len", [(50, 50), (10, 0), (1, 5),
                                               (25, 100)])
def test_find_all_matches_reference_c(seed, min_len, xdrop_len):
    if load_reference_lib() is None:
        pytest.skip("no C compiler for reference oracle")
    rng = np.random.default_rng(seed)
    scores = random_scores(rng, 2000)
    min_sc = S0 * min_len
    xdrop = S0 * xdrop_len * 10.0 if xdrop_len > 0 else -1.0
    expected = reference_mss_find_all(scores, min_sc, xdrop)
    got = mss.mss_find_all(scores, min_sc, xdrop)
    assert len(got) == len(expected)
    for seg, (st, en, sc) in zip(got, expected):
        assert seg["start"] == st
        assert seg["end"] == en
        assert seg["score"] == pytest.approx(sc, abs=0, rel=1e-15)


@pytest.mark.parametrize("seed", range(4))
def test_python_fallback_matches_native(seed):
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(100 + seed)
    scores = random_scores(rng, 1500)
    native_segs = mss.mss_find_all(scores, S0 * 20, S0 * 30 * 10)
    py_segs = mss._mss_find_all_py(scores, S0 * 20, S0 * 30 * 10)
    assert len(native_segs) == len(py_segs)
    for seg, (st, en, sc) in zip(native_segs, py_segs):
        assert (seg["start"], seg["end"]) == (st, en)
        assert seg["score"] == pytest.approx(sc, rel=1e-12)


def test_simple_positive_block():
    scores = np.array([-1.0] * 5 + [2.0] * 10 + [-1.0] * 5)
    segs = mss.mss_find_all(scores, min_score=10.0, xdrop=-1.0)
    assert len(segs) == 1
    assert (segs[0]["start"], segs[0]["end"]) == (5, 15)
    assert segs[0]["score"] == pytest.approx(20.0)


def test_min_score_truncation_quirk():
    # Threshold 10.9 truncates to 10 (mss.c:35), so a score of 10.5 passes.
    scores = np.array([-1.0, 3.5, 3.5, 3.5, -1.0])
    segs = mss.mss_find_all(scores, min_score=10.9, xdrop=-1.0)
    assert len(segs) == 1


def test_xdrop_reset_splits_segments():
    # Two strong blocks separated by a deep valley: with xdrop the valley
    # resets, yielding both blocks even though a bridged segment would score
    # higher than either.
    scores = np.array([5.0] * 10 + [-20.0] * 10 + [5.0] * 10)
    with_xdrop = mss.mss_find_all(scores, min_score=10.0, xdrop=30.0)
    assert [(s["start"], s["end"]) for s in with_xdrop] == [(0, 10), (20, 30)]


def test_find_mss_labels_majority_vote():
    n = 60
    scores = np.full(n, S0)
    labels = np.zeros(n, dtype=np.int64)
    labels[10:30] = 2
    labels[30:40] = 3
    out = mss.find_mss_labels(scores, labels, 5, min_mss_len=5, xdrop_len=5)
    assert out.shape == (n, 5)
    # Majority class is 2 (20 positions vs 10); label-0 positions adopt it.
    np.testing.assert_array_equal(out[:10].argmax(axis=1), np.full(10, 2))
    # Labeled positions keep their own label.
    np.testing.assert_array_equal(out[30:40].argmax(axis=1), np.full(10, 3))
    np.testing.assert_array_equal(out.sum(axis=1), np.ones(n))


def test_find_mss_labels_outside_segments_keep_raw_label():
    scores = np.concatenate([np.full(20, -10 * S0), np.full(60, S0),
                             np.full(20, -10 * S0)])
    labels = np.zeros(100, dtype=np.int64)
    labels[5] = 4     # outside any segment
    labels[30:80] = 1
    out = mss.find_mss_labels(scores, labels, 5, min_mss_len=10,
                              xdrop_len=10)
    assert out[5, 4] == 1.0
    assert out[0, 0] == 1.0
    assert out[25, 1] == 1.0  # inside segment, background -> majority 1


def test_find_mss_labels_tie_keeps_lowest_class():
    n = 20
    scores = np.full(n, S0)
    labels = np.zeros(n, dtype=np.int64)
    labels[0:5] = 3
    labels[5:10] = 1  # tie between 1 and 3 -> majority scan keeps 1? No:
    # counts are equal; reference scans classes 2..n with a strict '>', so
    # the FIRST class scanned (index 1) wins ties.
    out = mss.find_mss_labels(scores, labels, 5, min_mss_len=2, xdrop_len=2)
    assert out[15].argmax() == 1


@pytest.mark.parametrize("seed", range(4))
def test_labels_native_matches_python(seed):
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(200 + seed)
    scores = random_scores(rng, 800)
    labels = rng.integers(0, 5, size=800)
    got = mss.find_mss_labels(scores, labels, 5, 50, 50)
    exp = np.zeros((800, 5))
    mss._find_mss_labels_py(scores, labels.astype(np.int64), 5, 50, 50, exp)
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("threads", [2, 4, 7])
def test_multithreaded_identical_to_sequential(seed, threads):
    """The reset-point block decomposition must be EXACT for any thread
    count (see native/src/mss_parallel.cc for the proof sketch)."""
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(300 + seed)
    # >= 2^16 positions so the mt path actually splits; realistic score mix
    n = 1 << 17
    scores = random_scores(rng, n)
    st = mss.mss_find_all(scores, S0 * 50, S0 * 50 * 10, threads=1)
    mt = mss.mss_find_all(scores, S0 * 50, S0 * 50 * 10, threads=threads)
    assert len(st) == len(mt)
    np.testing.assert_array_equal(st["start"], mt["start"])
    np.testing.assert_array_equal(st["end"], mt["end"])
    np.testing.assert_array_equal(st["score"], mt["score"])


def test_multithreaded_labels_identical():
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    n = 1 << 17
    scores = random_scores(rng, n)
    labels = rng.integers(0, 5, size=n)
    st = mss.find_mss_labels(scores, labels, 5, 50, 50, threads=1)
    mt = mss.find_mss_labels(scores, labels, 5, 50, 50, threads=8)
    np.testing.assert_array_equal(st, mt)


def test_multithreaded_no_xdrop_falls_back():
    # xdrop disabled -> no provable reset points -> must still be correct
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(8)
    scores = random_scores(rng, 1 << 17)
    st = mss.mss_find_all(scores, S0 * 20, -1.0, threads=1)
    mt = mss.mss_find_all(scores, S0 * 20, -1.0, threads=8)
    np.testing.assert_array_equal(st["start"], mt["start"])


def test_empty_input():
    segs = mss.mss_find_all(np.array([]), 1.0, -1.0)
    assert len(segs) == 0
    out = mss.find_mss_labels(np.array([]), np.array([], dtype=np.int64), 5,
                              50, 50)
    assert out.shape == (0, 5)


@pytest.mark.parametrize("seed", [0, 3, 9])
def test_find_mss_classes_matches_labels_argmax(seed):
    """Direct class output == one-hot argmax, native and fallback."""
    rng = np.random.default_rng(seed)
    n = 1 << 15
    scores = random_scores(rng, n)
    labels = rng.integers(0, 5, size=n)
    one_hot = mss.find_mss_labels(scores, labels, 5, 50, 50)
    classes = mss.find_mss_classes(scores, labels, 5, 50, 50)
    np.testing.assert_array_equal(classes, one_hot.argmax(axis=1))
    assert classes.dtype == np.int32


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("min_gap", [1, 700])
def test_streaming_split_blocks_match_whole_array(seed, min_gap):
    """Streaming decomposition (SplitScanner + per-block labeling) is
    bit-identical to the whole-array MSS for ANY feed chunking and any
    min_gap — the exactness claim behind the engine's streaming host
    route."""
    import math

    rng = np.random.default_rng(seed)
    n = int(rng.integers(3000, 20000))
    scores = random_scores(rng, n)
    # plant long negative stretches so X-drop resets definitely occur
    for _ in range(6):
        start = int(rng.integers(0, n - 300))
        scores[start:start + 300] = -np.abs(scores[start:start + 300])
    labels = rng.integers(0, 5, size=n)
    min_len, xdrop_len = 25, 10
    want = mss.find_mss_classes(scores, labels, 5, min_len, xdrop_len)

    xdrop = S0 * xdrop_len * 10.0
    scanner = mss.SplitScanner(xdrop, min_gap=min_gap)
    feeds = sorted(set(rng.integers(1, n, size=12).tolist() + [n]))
    splits = []
    for upto in feeds:
        splits += scanner.feed(scores.astype(np.float32), upto)
    assert splits == sorted(splits)
    out = np.empty(n, np.int32)
    edges = [0] + splits + [n]
    for lo, hi in zip(edges[:-1], edges[1:]):
        if hi > lo:
            mss.streaming_mss_block_classes(scores, labels, out, lo, hi,
                                            5, min_len, xdrop_len)
    np.testing.assert_array_equal(out, want)
    if min_gap == 1:
        assert len(splits) > 0, "planted stretches must yield splits"
