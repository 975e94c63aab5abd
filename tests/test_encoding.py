"""One-hot encoder tests (reference: deepgrp/sequence.pyx:11-36)."""

import numpy as np
import pytest

from deepgrp_tpu import native
from deepgrp_tpu.ops import encoding

BASES = {"A": 0, "C": 1, "G": 2, "T": 3}


def naive_encode(seq: str):
    seq = seq.upper()
    start = 0
    end = len(seq)
    while start < end and seq[start] == "N":
        start += 1
    while end > start and seq[end - 1] == "N":
        end -= 1
    trimmed = seq[start:end]
    out = np.zeros((5, len(trimmed)), dtype=np.int8)
    for i, char in enumerate(trimmed):
        out[BASES.get(char, 4), i] = 1
    return start, out


@pytest.mark.parametrize("seed", range(5))
def test_roundtrip_random(random_dna, seed):
    seq = random_dna(997, seed=seed)
    start, onehot = encoding.one_hot_encode_dna_sequence(seq)
    exp_start, exp = naive_encode(seq)
    assert start == exp_start
    np.testing.assert_array_equal(onehot, exp)
    # every column is one-hot
    np.testing.assert_array_equal(onehot.sum(axis=0),
                                  np.ones(onehot.shape[1], dtype=np.int8))


def test_n_trimming():
    start, onehot = encoding.one_hot_encode_dna_sequence("NNNACGTNN")
    assert start == 3
    assert onehot.shape == (5, 4)
    np.testing.assert_array_equal(
        onehot,
        np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1],
                  [0, 0, 0, 0]], dtype=np.int8))


def test_all_n():
    start, onehot = encoding.one_hot_encode_dna_sequence("NNNN")
    assert start == 4
    assert onehot.shape == (5, 0)


def test_empty():
    start, onehot = encoding.one_hot_encode_dna_sequence("")
    assert start == 0
    assert onehot.shape == (5, 0)


def test_internal_n_and_unknown_chars():
    _, onehot = encoding.one_hot_encode_dna_sequence("ANXA")
    np.testing.assert_array_equal(onehot[4], [0, 1, 1, 0])


def test_lowercase():
    _, onehot = encoding.one_hot_encode_dna_sequence("acgt")
    np.testing.assert_array_equal(onehot.argmax(axis=0), [0, 1, 2, 3])


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_matches_numpy(random_dna):
    seq = random_dna(4096, seed=123)
    native_result = encoding._encode_native(native.load(),
                                            seq.encode("utf-8"))
    numpy_result = encoding._encode_numpy(seq.encode("utf-8"))
    assert native_result[0] == numpy_result[0]
    np.testing.assert_array_equal(native_result[1], numpy_result[1])


def test_encode_codes():
    np.testing.assert_array_equal(encoding.encode_codes("ACGTNX"),
                                  [0, 1, 2, 3, 4, 4])


def test_encode_codes_trimmed_matches_one_hot(random_dna):
    from deepgrp_tpu.ops.encoding import (encode_codes_trimmed,
                                          one_hot_encode_dna_sequence)

    for seed in range(4):
        seq = random_dna(500, alphabet="ACGTN", seed=seed)
        seq = "N" * (seed * 3) + seq + "N" * seed
        start_oh, onehot = one_hot_encode_dna_sequence(seq)
        start_c, codes = encode_codes_trimmed(seq)
        assert start_c == start_oh
        assert codes.shape[0] == onehot.shape[1]
        import numpy as np
        if codes.size:
            np.testing.assert_array_equal(onehot.argmax(axis=0), codes)


def test_encode_codes_trimmed_all_n():
    from deepgrp_tpu.ops.encoding import encode_codes_trimmed

    start, codes = encode_codes_trimmed("NNNN")
    assert codes.size == 0
    start, codes = encode_codes_trimmed("")
    assert codes.size == 0
