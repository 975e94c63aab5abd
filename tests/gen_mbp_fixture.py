"""Generate the Mbp-scale reference-parity BED fixture.

Run manually (TF required):  python tests/gen_mbp_fixture.py

Pushes the ACTUAL reference pipeline (the trained flagship fixture model
``gru_att.h5`` + the reference C kernels compiled as oracles + the
reference labeling transliterations — see gen_reference_fixtures.py) over
a ~5 Mbp deterministic synthetic chromosome (tests/synth_mbp.py), and
records the expected BED rows in ``fixtures/reference/mbp.bed`` plus
parameters in ``mbp_manifest.json``.  The FASTA itself is reproduced from
the seed at test time (storing 5 MB of random bases in git buys nothing).

This reaches the engine paths 20 kb fixtures cannot: slice pipelining
(>> SLICE_CHUNKS chunks), chunk-count bucketing with masked padding
chunks, and Mbp-distance spill carries (tests/test_mbp_parity.py).
"""

import json
import os
import sys

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

import numpy as np

import synth_mbp

SEED = 2024
N_WINDOWS = 1536 * synth_mbp.REF_BATCH  # 98304 windows, ~4.9 Mbp
MIN_MSS_LEN = 50
XDROP_LEN = 50
N_CLASSES = 5


def main() -> None:
    import gen_reference_fixtures as gen  # imports the reference + TF

    import tf_keras

    sys.path.insert(0, gen._REFROOT)
    import deepgrp.model as refmodel

    fixdir = gen._FIXDIR
    h5 = os.path.join(fixdir, "gru_att.h5")
    assert os.path.exists(h5), "run gen_reference_fixtures.py first"
    model = tf_keras.models.load_model(
        h5, compile=False,
        custom_objects={"ReverseComplement": refmodel.ReverseComplement})

    seq = synth_mbp.make_mbp_sequence(SEED, N_WINDOWS)
    print(f"sequence: {len(seq)} bp ({N_WINDOWS} windows)", flush=True)

    header = "mbp_chr"
    rows_fixed, merged = gen.ref_pipeline_bed(
        model, header, seq, synth_mbp.VECSIZE, synth_mbp.STEP,
        synth_mbp.REF_BATCH, N_CLASSES, MIN_MSS_LEN, XDROP_LEN,
        fixed_offset=True)
    # Exact-multiple window count: the reference's own (buggy) offset
    # arithmetic must agree bitwise, so this BED is the true reference
    # output, not just the corrected-offset variant.
    rows_buggy, merged_buggy = gen.ref_pipeline_bed(
        model, header, seq, synth_mbp.VECSIZE, synth_mbp.STEP,
        synth_mbp.REF_BATCH, N_CLASSES, MIN_MSS_LEN, XDROP_LEN,
        fixed_offset=False)
    assert rows_fixed == rows_buggy
    assert np.array_equal(merged, merged_buggy)

    srt = np.sort(merged, axis=1)
    gap = srt[:, -1] - srt[:, -2]
    print(f"{len(rows_fixed)} BED rows; near-ties(<1e-3): "
          f"{(gap < 1e-3).sum()}; median top-2 gap {np.median(gap):.4f}")

    with open(os.path.join(fixdir, "mbp.bed"), "w") as fh:
        fh.write("\n".join(rows_fixed) + "\n")
    with open(os.path.join(fixdir, "mbp_manifest.json"), "w") as fh:
        json.dump({
            "seed": SEED, "n_windows": N_WINDOWS, "header": header,
            "vecsize": synth_mbp.VECSIZE, "step_size": synth_mbp.STEP,
            "batch_size": synth_mbp.REF_BATCH,
            "min_mss_len": MIN_MSS_LEN, "xdrop_len": XDROP_LEN,
            "n_bed_rows": len(rows_fixed),
            "seq_len": len(seq),
        }, fh, indent=2)
    print("wrote", os.path.join(fixdir, "mbp.bed"))


if __name__ == "__main__":
    main()
