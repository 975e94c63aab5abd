"""Overlap-max merge tests (reference: deepgrp/maxcalc.c, sequence.pyx:67)."""

import numpy as np
import pytest

from deepgrp_tpu.ops import overlap_max

from reference_oracle import load_reference_lib, reference_get_max


def naive_merge(out_len, windows, stride):
    out = np.zeros((out_len, windows.shape[2]), dtype=np.float32)
    for b in range(windows.shape[0]):
        lo = b * stride
        hi = lo + windows.shape[1]
        out[lo:hi] = np.maximum(out[lo:hi], windows[b])
    return out


@pytest.mark.parametrize("seed,batch,dim0,dim1,stride", [
    (0, 8, 150, 5, 50),
    (1, 3, 7, 5, 2),
    (2, 1, 10, 4, 3),
    (3, 12, 342, 5, 50),
    (4, 5, 6, 2, 6),    # stride == window: no overlap
    (5, 4, 9, 3, 11),   # stride > window: gaps
])
def test_host_get_max_matches_naive(seed, batch, dim0, dim1, stride):
    rng = np.random.default_rng(seed)
    windows = rng.random((batch, dim0, dim1), dtype=np.float32)
    out_len = (batch - 1) * stride + dim0 + 3
    expected = naive_merge(out_len, windows, stride)
    got = np.zeros((out_len, dim1), dtype=np.float32)
    overlap_max.get_max(got, windows, stride)
    np.testing.assert_array_equal(got, expected)


def test_host_get_max_matches_reference_c():
    if load_reference_lib() is None:
        pytest.skip("no C compiler for reference oracle")
    rng = np.random.default_rng(42)
    windows = rng.random((6, 150, 5), dtype=np.float32)
    out_len = 5 * 50 + 150
    ours = np.zeros((out_len, 5), dtype=np.float32)
    ref = np.zeros((out_len, 5), dtype=np.float32)
    overlap_max.get_max(ours, windows, 50)
    reference_get_max(ref, windows, 50)
    np.testing.assert_array_equal(ours, ref)


def test_host_get_max_accumulates_inplace():
    windows = np.full((2, 4, 3), 0.5, dtype=np.float32)
    out = np.full((8, 3), 0.7, dtype=np.float32)
    overlap_max.get_max(out, windows, 2)
    np.testing.assert_array_equal(out, np.full((8, 3), 0.7, dtype=np.float32))


@pytest.mark.parametrize("seed,n,vecsize,step,extra", [
    (0, 8, 150, 50, 0),
    (1, 5, 342, 50, 10),   # vecsize not a multiple of step
    (2, 1, 10, 3, 0),
    (3, 7, 12, 12, 5),     # no overlap
    (4, 2, 9, 4, 100),     # out_len far beyond coverage
])
def test_device_merge_matches_host(seed, n, vecsize, step, extra):
    rng = np.random.default_rng(seed)
    windows = rng.random((n, vecsize, 5), dtype=np.float32)
    out_len = (n - 1) * step + vecsize + extra
    expected = naive_merge(out_len, windows, step)
    got = np.asarray(overlap_max.overlap_max_merge(windows, step, out_len))
    np.testing.assert_allclose(got, expected, rtol=0, atol=0)


def test_device_merge_truncates_to_out_len():
    rng = np.random.default_rng(9)
    windows = rng.random((4, 8, 2), dtype=np.float32)
    out_len = 10  # shorter than the covered span
    got = np.asarray(overlap_max.overlap_max_merge(windows, 2, out_len))
    expected = naive_merge(3 * 2 + 8, windows, 2)[:10]
    np.testing.assert_array_equal(got, expected)


def test_device_merge_empty():
    windows = np.zeros((0, 8, 5), dtype=np.float32)
    got = np.asarray(overlap_max.overlap_max_merge(windows, 2, 13))
    np.testing.assert_array_equal(got, np.zeros((13, 5), dtype=np.float32))
