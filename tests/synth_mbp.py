"""Deterministic Mbp-scale synthetic chromosome (shared by the fixture
generator and the parity test, so the FASTA itself never needs storing).

The sequence is fully determined by (seed, n_windows): random ACGT
background with planted tandem-repeat segments of classes 1..4, wrapped in
N padding so the reference N-trim path is exercised.  Window count is an
exact multiple of the reference batch (64), where the reference's
partial-batch offset quirk is inert — the recorded BED is bitwise what
the real reference produces (see gen_reference_fixtures.py docstring).
"""

from __future__ import annotations

import numpy as np

VECSIZE = 342  # flagship config (defaults.toml)
STEP = 50
REF_BATCH = 64
LEAD_N = 13
TRAIL_N = 29

_BASES = np.array(list("ACGT"))


def mbp_motifs(rng: np.random.Generator) -> dict:
    return {
        1: "GGAAT",
        2: "".join(rng.choice(_BASES, size=31)),
        3: "".join(rng.choice(_BASES, size=53)),
        4: "".join(rng.choice(_BASES, size=67)),
    }


def core_len(n_windows: int) -> int:
    # len(range(0, L - vecsize, step)) == ceil((L - vecsize) / step)
    return VECSIZE + STEP * n_windows


def make_mbp_sequence(seed: int, n_windows: int,
                      coverage: float = 0.35) -> str:
    rng = np.random.default_rng(seed)
    motifs = mbp_motifs(rng)
    length = core_len(n_windows)
    seq = rng.choice(_BASES, size=length)
    labels = np.zeros(length, dtype=bool)
    target = int(length * coverage)
    planted = 0
    while planted < target:
        cls = int(rng.integers(1, 5))
        seg_len = int(rng.integers(250, 800))
        start = int(rng.integers(0, length - seg_len))
        if labels[start:start + seg_len].any():
            continue
        motif = motifs[cls]
        tiled = (motif * (seg_len // len(motif) + 1))[:seg_len]
        seq[start:start + seg_len] = list(tiled)
        labels[start:start + seg_len] = True
        planted += seg_len
    return "N" * LEAD_N + "".join(seq) + "N" * TRAIL_N


def write_fasta(path: str, header: str, seq: str) -> None:
    with open(path, "w") as fh:
        fh.write(">" + header + "\n")
        for i in range(0, len(seq), 70):
            fh.write(seq[i:i + 70] + "\n")
