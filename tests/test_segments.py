"""Segment iteration / filtering parity tests (sequence.pyx:40-53,79-85 and
prediction.py:242-260)."""

import numpy as np
import pytest

from deepgrp_tpu.ops import segments


def reference_yield_segments(classes, start_offset):
    """Direct transliteration of the reference scan, used as oracle."""
    i = 0
    while i < classes.size:
        start, end, label = segments.get_segments(classes, i)
        i = end
        yield start + start_offset, end + start_offset, label


def reference_filter_segments(array, min_len=50):
    indices = np.where(array > 0)[0]
    next_idx = 0
    for idx in indices:
        if next_idx > idx:
            continue
        next_idx = idx + 1
        found = 1
        while next_idx < array.size and array[next_idx] == array[idx]:
            found += 1
            next_idx += 1
        if found < min_len:
            array[idx:next_idx] = 0


@pytest.mark.parametrize("begin,start,end,label", [
    (0, 0, 10, 3), (0, 5, 10, 1), (3, 5, 10, 2), (0, 0, 1, 1), (2, 4, 5, 4),
])
def test_get_segments_parametrized(begin, start, end, label):
    classes = np.zeros(12, dtype=np.int64)
    classes[start:end] = label
    got = segments.get_segments(classes, begin)
    expected_end = min(end, classes.size - 1)
    assert got == (start, max(expected_end, start + 1), label)


@pytest.mark.parametrize("seed", range(10))
def test_segments_from_classes_matches_reference_scan(seed):
    rng = np.random.default_rng(seed)
    # Blocky label arrays similar to MSS output.
    n = 200
    classes = np.zeros(n, dtype=np.int64)
    pos = 0
    while pos < n:
        run = int(rng.integers(1, 20))
        classes[pos:pos + run] = int(rng.integers(0, 5))
        pos += run
    expected = list(reference_yield_segments(classes, 7))
    got = list(segments.yield_segments(classes, 7))
    assert got == expected


def test_trailing_run_split_quirk():
    # The reference never extends a segment past index size-2, so the last
    # element of a trailing run is its own segment.
    classes = np.array([1, 1, 1], dtype=np.int64)
    assert list(segments.yield_segments(classes, 0)) == [(0, 2, 1), (2, 3, 1)]


def test_single_element():
    assert segments.segments_from_classes(np.array([2])) == [(0, 1, 2)]
    assert segments.segments_from_classes(np.array([0])) == [(0, 1, 0)]


def test_all_background():
    classes = np.zeros(5, dtype=np.int64)
    assert segments.segments_from_classes(classes) == [(4, 5, 0)]


def test_empty_classes():
    assert segments.segments_from_classes(np.array([], dtype=np.int64)) == []


@pytest.mark.parametrize("seed,min_len", [(0, 3), (1, 5), (2, 1), (3, 50)])
def test_filter_segments_matches_reference(seed, min_len):
    rng = np.random.default_rng(seed)
    array = rng.integers(0, 4, size=300)
    # make some long runs
    array[50:120] = 2
    array[200:202] = 3
    expected = array.copy()
    reference_filter_segments(expected, min_len)
    got = array.copy()
    segments.filter_segments(got, min_len)
    np.testing.assert_array_equal(got, expected)


def test_filter_segments_empty():
    arr = np.array([], dtype=np.int64)
    segments.filter_segments(arr, 5)
    assert arr.size == 0
