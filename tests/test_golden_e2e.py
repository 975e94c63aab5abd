"""Golden end-to-end regression: deterministic model + sequence -> BED.

Guards the full pipeline (init -> window scan -> merge -> scoring -> MSS ->
segmentation) against unintended numeric or behavioral drift.  The fixture
was generated on CPU float32 with seed 42 (see git history); if a
deliberate change alters it, regenerate and explain in the commit.
"""

import json
import os

import numpy as np

import jax

from deepgrp_tpu.config import Options
from deepgrp_tpu.models import create_model
from deepgrp_tpu.ops.encoding import one_hot_encode_dna_sequence
from deepgrp_tpu.ops.segments import segments_from_classes
from deepgrp_tpu.predict import apply_mss_scored
from deepgrp_tpu.predict.engine import PredictionEngine

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_e2e.json")


def test_end_to_end_matches_golden():
    with open(GOLDEN) as f:
        golden = json.load(f)

    rng = np.random.default_rng(golden["seed"])
    seq = "NN" + "".join(rng.choice(list("ACGT"), 5000)) + "N"
    assert len(seq) == golden["seq_len"]

    options = Options(vecsize=golden["vecsize"], units=golden["units"],
                      attention=True)
    model = create_model(options)
    params = model.init(jax.random.PRNGKey(golden["seed"]))
    start, onehot = one_hot_encode_dna_sequence(seq)
    engine = PredictionEngine(model, batch_size=golden["batch"],
                              step_size=golden["step"])
    classes, maxp = engine.predict_scored(params, onehot)
    lbl = apply_mss_scored(classes, maxp, options, 5).argmax(axis=1)
    segs = [[s + start, e + start, l]
            for s, e, l in segments_from_classes(lbl) if l > 0]

    assert len(segs) == golden["n_segments"]
    assert segs == golden["segments"]
