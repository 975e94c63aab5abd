"""On-device MSS vs the host library (C++/python oracle).

The device formulation must reproduce the host ``mss_find_all`` /
``find_mss_labels`` outputs exactly.  Scores are drawn on a dyadic grid
(multiples of 0.25) so float32 prefix sums are exact and the comparison is
bit-level rather than tolerance-based.
"""

import numpy as np
import pytest

from deepgrp_tpu.ops import mss
from deepgrp_tpu.ops.mss_device import (count_positive_runs,
                                        find_mss_labels_auto,
                                        find_mss_labels_device,
                                        mss_find_all_device)


def _random_scores(rng, n, pos_frac=0.35, scale=8.0):
    """Dyadic-grid scores with mixed-sign structure (runs + gaps)."""
    raw = rng.normal(0.0, scale, size=n)
    raw += scale * (rng.random(n) < pos_frac)
    return np.round(raw * 4.0) / 4.0


def _host_segments(scores, min_score, xdrop):
    segs = mss.mss_find_all(scores, min_score, xdrop)
    return [(int(s["start"]), int(s["end"]), float(s["score"]))
            for s in segs]


def _device_segments(scores, min_score, xdrop, max_runs):
    import jax.numpy as jnp
    out = mss_find_all_device(jnp.asarray(scores, jnp.float32), min_score,
                              xdrop, max_runs=max_runs)
    assert not bool(out.overflow)
    count = int(out.count)
    return [(int(out.starts[i]), int(out.ends[i]), float(out.scores[i]))
            for i in range(count)]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("xdrop", [-1.0, 30.0, 200.0])
def test_find_all_matches_host(seed, xdrop):
    rng = np.random.default_rng(seed)
    scores = _random_scores(rng, 4000)
    min_score = 10.0
    host = _host_segments(scores, min_score, xdrop)
    dev = _device_segments(scores, min_score, xdrop,
                           max_runs=count_positive_runs(scores) + 8)
    assert sorted(dev) == sorted(host)
    assert dev == sorted(dev)  # ascending-start emission order


def test_find_all_min_score_truncation():
    # mss.c:35 truncates the threshold to int: a segment scoring 10.5
    # passes min_score=10.9 (trunc -> 10).
    scores = np.array([10.5, -50.0, 3.0], dtype=np.float64)
    host = _host_segments(scores, 10.9, -1.0)
    dev = _device_segments(scores, 10.9, -1.0, max_runs=8)
    assert dev == host
    assert any(s[2] == 10.5 for s in dev)


@pytest.mark.parametrize("scores", [
    np.zeros(16),                      # no positive run
    -np.ones(16),                      # all negative
    np.ones(16),                       # one giant run
    np.array([5.0]),                   # single element
    np.array([-1.0]),
    np.array([], dtype=np.float64),    # empty
])
def test_find_all_edge_cases(scores):
    host = _host_segments(scores, 1.0, 10.0)
    dev = _device_segments(scores, 1.0, 10.0, max_runs=16)
    assert dev == host


def test_find_all_nested_candidates():
    # Staircase forcing a deep candidate stack (merge + backptr paths).
    parts = []
    for k in range(20):
        parts += [100.0 - 4 * k, -1.0]
    parts += [500.0]
    scores = np.array(parts)
    for xdrop in (-1.0, 50.0):
        host = _host_segments(scores, 2.0, xdrop)
        dev = _device_segments(scores, 2.0, xdrop, max_runs=64)
        assert dev == host


def test_overflow_flag():
    import jax.numpy as jnp
    scores = jnp.asarray(np.tile([1.0, -1.0], 50))
    out = mss_find_all_device(scores, 0.5, -1.0, max_runs=4)
    assert bool(out.overflow)


@pytest.mark.parametrize("seed", [0, 7])
@pytest.mark.parametrize("min_len,xdrop_len", [(5, 0), (5, 10), (20, 4)])
def test_labels_match_host(seed, min_len, xdrop_len):
    rng = np.random.default_rng(seed)
    n, nof_labels = 3000, 5
    # apply_mss-shaped scores: +t for repeat argmax, -10t for background,
    # on the dyadic grid for exact float32 prefix sums.
    labels = rng.integers(0, nof_labels, size=n)
    t = np.round(rng.uniform(0.5, 4.5, size=n) * 4.0) / 4.0
    scores = np.where(labels > 0, t, -10.0 * t)

    host = mss.find_mss_labels(scores, labels.astype(np.int64), nof_labels,
                               min_len, xdrop_len)
    dev = find_mss_labels_auto(scores, labels, nof_labels, min_len,
                               xdrop_len)
    np.testing.assert_array_equal(np.asarray(dev, np.float64), host)


def test_labels_majority_tie_prefers_lowest_class():
    # Inside one segment: classes 2 and 3 tie -> majority must be 2, and
    # background positions adopt it.
    labels = np.array([2, 0, 3, 2, 3], dtype=np.int64)
    scores = np.array([5.0, 5.0, 5.0, 5.0, 5.0])
    host = mss.find_mss_labels(scores, labels, 5, 2, 0)
    dev = find_mss_labels_auto(scores, labels, 5, 2, 0)
    np.testing.assert_array_equal(np.asarray(dev, np.float64), host)
    assert host[1, 2] == 1.0


def test_labels_device_jit_capacity_padding():
    # Fixed max_runs larger than needed must not change the result.
    import jax.numpy as jnp
    labels = np.array([0, 1, 1, 0, 0, 2, 2, 0], dtype=np.int64)
    scores = np.array([-1.0, 4.0, 4.0, -30.0, -30.0, 4.0, 4.0, -1.0])
    host = mss.find_mss_labels(scores, labels, 3, 1, 1)
    out, overflow = find_mss_labels_device(jnp.asarray(scores, jnp.float32),
                                           jnp.asarray(labels), 3, 1, 1,
                                           max_runs=32)
    assert not bool(overflow)
    np.testing.assert_array_equal(np.asarray(out, np.float64), host)


@pytest.mark.parametrize("seed", range(5))
def test_hybrid_candidates_route_matches_pure_device(seed):
    """The hybrid route (device collapse -> host stack scan -> device
    labeling) is bit-identical to the all-on-chip MSS — the host scan
    replicates the device run_body's f32 arithmetic exactly."""
    import jax.numpy as jnp

    from deepgrp_tpu.config import Options
    from deepgrp_tpu.predict.postprocess import (apply_mss_candidates,
                                                 apply_mss_on_device)

    rng = np.random.default_rng(seed)
    n = int(rng.integers(2000, 9000))
    out_len = n - int(rng.integers(0, 400))
    classes = rng.integers(0, 5, size=n).astype(np.int8)
    maxp = rng.uniform(0.2, 1.0, size=n).astype(np.float32)
    # sparse repeats: zero out most positions so the track has few runs
    mask = rng.random(n) < 0.9
    classes[mask] = 0
    maxp[mask] = rng.uniform(0.9, 1.0, size=int(mask.sum()))
    options = Options(min_mss_len=20, xdrop_len=10)
    track_len = out_len

    class FakeTrack:
        @property
        def out_len(self):
            return track_len

        def device(self):
            return jnp.asarray(classes), jnp.asarray(maxp)

    want = apply_mss_on_device(jnp.asarray(classes), jnp.asarray(maxp),
                               options, 5, out_len)
    got = apply_mss_candidates(FakeTrack(), options, 5, runs_hint=n)
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got, np.int64),
                                  np.asarray(want, np.int64))


def test_hybrid_candidates_overflow_returns_none():
    import jax.numpy as jnp

    from deepgrp_tpu.config import Options
    from deepgrp_tpu.predict.postprocess import apply_mss_candidates

    rng = np.random.default_rng(0)
    n = 4000
    classes = rng.integers(0, 5, size=n).astype(np.int8)
    maxp = rng.uniform(0.2, 1.0, size=n).astype(np.float32)

    class FakeTrack:
        out_len = n

        def device(self):
            return jnp.asarray(classes), jnp.asarray(maxp)

    # runs_hint far below the true noisy run count -> capacity overflow
    out = apply_mss_candidates(FakeTrack(), Options(), 5, runs_hint=1)
    assert out is None
