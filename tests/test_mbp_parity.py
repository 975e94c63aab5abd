"""Chromosome-scale bitwise BED parity vs the actual reference.

The ~5 Mbp fixture (gen_mbp_fixture.py; sequence reproduced from its
seed, BED recorded from the real reference pipeline) drives the engine
through the regimes the 20 kb fixtures cannot reach: tens of pipeline
slices (``SLICE_CHUNKS`` overflow), bucketed chunk counts with masked
padding chunks, and spill carries across Mbp distances — on both the
single-device and the sharded engine.
"""

import json
import os

import pytest

import synth_mbp
from deepgrp_tpu import cli

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "fixtures", "reference")
MANIFEST = os.path.join(FIXDIR, "mbp_manifest.json")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.exists(MANIFEST),
                       reason="mbp fixture not generated"),
]


@pytest.fixture(scope="module")
def mbp_fasta(tmp_path_factory):
    man = json.load(open(MANIFEST))
    seq = synth_mbp.make_mbp_sequence(man["seed"], man["n_windows"])
    assert len(seq) == man["seq_len"]
    path = tmp_path_factory.mktemp("mbp") / "mbp.fa"
    synth_mbp.write_fasta(str(path), man["header"], seq)
    return man, str(path)


@pytest.mark.parametrize("mesh", ["off", "auto"])
def test_mbp_bed_bitwise_parity(mbp_fasta, mesh, tmp_path):
    man, fasta = mbp_fasta
    out = tmp_path / f"mbp_{mesh}.bed"
    # A deliberately different engine batch (512 vs the reference's 64):
    # parity must hold across chunking/bucketing/slicing choices.
    cli.main([
        "-b", "512", "-s", str(man["step_size"]),
        "-x", str(man["xdrop_len"]), "-l", str(man["min_mss_len"]),
        "predict", os.path.join(FIXDIR, "gru_att.h5"), fasta,
        "--output", str(out), "--mesh", mesh,
    ])
    got = [line.split("\t", 1)[1] for line in
           out.read_text().splitlines()]
    want = open(os.path.join(FIXDIR, "mbp.bed")).read().splitlines()
    assert len(got) == len(want)
    assert got == want
