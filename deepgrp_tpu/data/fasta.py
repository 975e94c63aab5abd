"""FASTA reading and the ``preprocess_sequence`` npz pipeline.

Parity with the reference:
  * ``read_multi_fasta`` streams ``(header, sequence)`` records, upper-cases
    sequence lines (``/root/reference/deepgrp/__main__.py:20-43``),
  * ``parse_gzip_fasta`` + ``write_npz`` reproduce the
    ``preprocess_sequence`` console tool: gzip FASTA -> one-hot
    ``int8[5, len]`` saved with an md5-of-raw-sequence-lines hash so
    regeneration is skipped when the input is unchanged
    (``/root/reference/deepgrp/_scripts/preprocess_sequence.py:19-74``).
    Multi-record files are concatenated into one sequence like the
    reference parser.
"""

from __future__ import annotations

import gzip
import hashlib
from typing import BinaryIO, Iterator, TextIO, Tuple

import numpy as np

from deepgrp_tpu.ops.encoding import encode_codes


def read_multi_fasta(filestream: TextIO) -> Iterator[Tuple[str, str]]:
    """Yield ``(header, sequence)`` for each record of a multi-FASTA stream."""
    header = ""
    sequence = []
    for line in filestream:
        line = line.strip()
        if not line:
            continue
        if line[0] == ">":
            if header:
                yield header, "".join(sequence)
            header = line[1:]
            sequence = []
        else:
            sequence.append(line.upper())
    if header:
        yield header, "".join(sequence)


def parse_gzip_fasta(filestream: BinaryIO) -> Tuple[str, str, str]:
    """Read a (possibly multi-record) FASTA stream, hashing sequence lines.

    Returns (last header, md5 hex digest of the raw stripped sequence lines,
    concatenated upper-cased sequence) — preprocess_sequence.py:19-38 parity.
    """
    sequence = []
    header = ""
    hash_md5 = hashlib.md5()
    for line in filestream:
        line = line.strip()
        if not line:
            continue
        if line[0:1] == b">":
            header = line[1:].decode()
        else:
            sequence.append(line.decode().upper())
            hash_md5.update(line)
    return header, hash_md5.hexdigest(), "".join(sequence)


def one_hot_from_sequence(seq: str) -> np.ndarray:
    """Full-length one-hot ``int8[5, len]`` (no N trimming; npz format)."""
    codes = encode_codes(seq)
    out = np.zeros((5, codes.size), dtype=np.int8)
    out[codes, np.arange(codes.size)] = 1
    return out


def preprocess_sequence_file(fasta_path: str, force: bool = False) -> bool:
    """Create ``<fasta_path>.npz`` with keys ``fwd`` and ``hash``.

    Skips regeneration when the stored hash matches, unless ``force``.
    Returns True when a new npz was written.
    """
    with gzip.open(fasta_path, "rb") as infile:
        _, hash_val, seq = parse_gzip_fasta(infile)

    create_new = force
    try:
        stored = np.load(fasta_path + ".npz")["hash"]
        if hash_val != stored[0]:
            create_new = True
    except (IOError, KeyError):
        create_new = True

    if create_new:
        np.savez_compressed(fasta_path, fwd=one_hot_from_sequence(seq),
                            hash=np.array([hash_val]))
    return create_new
