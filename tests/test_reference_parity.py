"""North-star parity: bitwise BED equality against the ACTUAL reference.

The fixtures under ``fixtures/reference/`` were produced by
``gen_reference_fixtures.py`` running the real reference implementation
(/root/reference, TF2/tf_keras) end to end: reference-built and
reference-trained Keras models saved as whole-model HDF5
(``__main__.py:349-351``), the reference prediction pipeline
(``predict_on_batch`` + the reference C kernels compiled as oracles +
literal transliterations of the reference Cython labeling), and the
resulting expected BED rows (``__main__.py:288-292`` format).

These tests run WITHOUT TensorFlow: they load the reference HDF5 into this
framework (``keras_io.load_keras_h5``), check the forward numerics against
the recorded reference probabilities, and assert that the full CLI
FASTA-to-BED pipeline reproduces the reference BED rows EXACTLY.

Records named ``*_exact`` have window counts that are exact multiples of
the batch size, where the reference's partial-batch offset quirk
(prediction.py:105 uses the current batch's size) is inert — on those
records this framework's output is bitwise what the real reference
produces.  Records named ``*_partial`` exercise the final-partial-batch
case with the corrected offset (the generator computes it from the true
window index), documenting the deliberate divergence from the reference's
misplacement bug (see predict/engine.py module docstring).
"""

import json
import os

import numpy as np
import pytest

import jax

from deepgrp_tpu import cli
from deepgrp_tpu.data.fasta import read_multi_fasta
from deepgrp_tpu.models.keras_io import load_keras_h5
from deepgrp_tpu.models.model import DeepGRPModel
from deepgrp_tpu.ops.encoding import one_hot_encode_dna_sequence

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "fixtures", "reference")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIXDIR, "manifest.json")),
    reason="reference fixtures not generated")


def manifest():
    with open(os.path.join(FIXDIR, "manifest.json")) as fh:
        return json.load(fh)


CONFIG_NAMES = ["gru_att", "gru", "lstm"]


@pytest.mark.parametrize("name", CONFIG_NAMES)
def test_h5_import_architecture(name):
    man = manifest()["configs"][name]
    config, params = load_keras_h5(os.path.join(FIXDIR, f"{name}.h5"))
    assert config.vecsize == man["vecsize"]
    assert config.units == man["units"]
    assert config.rnn == man["rnn"]
    assert config.attention == man["attention"]
    assert config.n_classes == 5


@pytest.mark.parametrize("name", CONFIG_NAMES)
def test_forward_matches_reference_probs(name):
    """Forward outputs on reference-trained weights match the recorded
    reference probabilities to float32 recurrence tolerance."""
    man = manifest()
    config, params = load_keras_h5(os.path.join(FIXDIR, f"{name}.h5"))
    model = DeepGRPModel(config)
    with open(os.path.join(FIXDIR, f"{name}.fa")) as fh:
        _, seq = next(read_multi_fasta(fh))
    _, onehot = one_hot_encode_dna_sequence(seq)
    data = onehot.T.astype(np.float32)
    step = man["step_size"]
    wins = np.stack([
        data[s:s + config.vecsize]
        for s in range(0, man["n_prob_windows"] * step, step)
    ])
    ours = np.asarray(model.apply(jax.device_put(params), wins))
    ref = np.load(os.path.join(FIXDIR, f"{name}_probs.npy"))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("mesh", ["off", "auto"])
@pytest.mark.parametrize("name", CONFIG_NAMES)
def test_bed_bitwise_parity(name, mesh, tmp_path):
    """FASTA -> BED through the full CLI equals the reference BED exactly,
    on both the single-device and the sharded engine."""
    man = manifest()
    out = tmp_path / f"{name}.bed"
    cli.main([
        "-b", str(man["batch_size"]), "-s", str(man["step_size"]),
        "-x", str(man["xdrop_len"]), "-l", str(man["min_mss_len"]),
        "predict", os.path.join(FIXDIR, f"{name}.h5"),
        os.path.join(FIXDIR, f"{name}.fa"), "--output", str(out),
        "--mesh", mesh,
    ])
    got = [line.split("\t", 1)[1] for line in
           out.read_text().splitlines()]
    want = open(os.path.join(FIXDIR, f"{name}.bed")).read().splitlines()
    assert got == want


@pytest.mark.parametrize("name", ["gru_att", "gru"])
def test_bfloat16_engine_accuracy(name):
    """bfloat16 inference stays accurate on reference-trained weights.

    bfloat16 is the fast mode (--precision bfloat16), not a parity mode;
    this pins that its per-position class calls agree with the float32
    engine on nearly all positions, so the speedup is usable for real
    annotation work.
    """
    from deepgrp_tpu.predict.engine import PredictionEngine
    import jax.numpy as jnp

    man = manifest()
    config, params = load_keras_h5(os.path.join(FIXDIR, f"{name}.h5"))
    model = DeepGRPModel(config)
    with open(os.path.join(FIXDIR, f"{name}.fa")) as fh:
        _, seq = next(read_multi_fasta(fh))
    _, onehot = one_hot_encode_dna_sequence(seq)
    step, batch = man["step_size"], man["batch_size"]
    f32 = PredictionEngine(model, batch_size=batch, step_size=step)
    bf16 = PredictionEngine(model, batch_size=batch, step_size=step,
                            compute_dtype=jnp.bfloat16)
    params = jax.device_put(params)
    c32, _ = f32.predict_scored(params, onehot)
    c16, _ = bf16.predict_scored(params, onehot)
    agreement = float((c32 == c16).mean())
    assert agreement >= 0.95, f"bf16/f32 class agreement {agreement:.3f}"


@pytest.mark.parametrize("name", ["gru_att", "gru"])
def test_bfloat16_quality_contract(name):
    """Quantified bf16 quality bound through the FULL annotation pipeline.

    The fast mode's contract is not just positionwise agreement: after
    MSS labeling (the product output), the bf16 run must agree with the
    float32 run at segment level — R_K Matthews correlation (the
    reference's headline metric, prediction.py:144-239) >= 0.95 treating
    the f32 annotation as reference, and post-MSS positionwise class
    agreement >= 0.98 (MSS labeling smooths per-window wobble, so the
    post-MSS bound is TIGHTER than the raw 0.95 above).
    """
    import jax.numpy as jnp

    from deepgrp_tpu.config import Options
    from deepgrp_tpu.predict.engine import PredictionEngine
    from deepgrp_tpu.predict.metrics import (
        calculate_multiclass_matthews_cc, confusion_matrix)
    from deepgrp_tpu.predict.postprocess import predict_sequence

    man = manifest()
    config, params = load_keras_h5(os.path.join(FIXDIR, f"{name}.h5"))
    model = DeepGRPModel(config)
    with open(os.path.join(FIXDIR, f"{name}.fa")) as fh:
        _, seq = next(read_multi_fasta(fh))
    _, onehot = one_hot_encode_dna_sequence(seq)
    options = Options(vecsize=config.vecsize,
                      min_mss_len=man["min_mss_len"],
                      xdrop_len=man["xdrop_len"])
    params = jax.device_put(params)
    step, batch = man["step_size"], man["batch_size"]
    f32 = PredictionEngine(model, batch_size=batch, step_size=step)
    bf16 = PredictionEngine(model, batch_size=batch, step_size=step,
                            compute_dtype=jnp.bfloat16)
    cls32 = np.asarray(predict_sequence(model, params, onehot, options,
                                        step, True, engine=f32), np.int64)
    cls16 = np.asarray(predict_sequence(model, params, onehot, options,
                                        step, True, engine=bf16), np.int64)
    agreement = float((cls32 == cls16).mean())
    assert agreement >= 0.98, f"post-MSS agreement {agreement:.4f}"
    mcc = calculate_multiclass_matthews_cc(confusion_matrix(cls32, cls16))
    assert mcc >= 0.95, f"bf16-vs-f32 R_K MCC {mcc:.4f}"


@pytest.mark.parametrize("name", ["gru_att", "gru", "lstm"])
def test_bed_bitwise_parity_fused(name, tmp_path):
    """The fused Pallas recurrence reproduces the reference BED exactly.

    This is the evidence behind ``resolve_rnn_kernel``'s "auto" policy
    enabling the fused kernel for float32 GRU inference on TPU: the
    kernel's input projection is an exact row select and its recurrent
    dot runs at HIGHEST precision, so the BED output matches the
    reference bitwise.  On CPU the kernel runs through the Pallas
    interpreter; run with DEEPGRP_TEST_PLATFORM=tpu to validate the real
    Mosaic compilation on hardware.
    """
    man = manifest()
    out = tmp_path / f"{name}.bed"
    cli.main([
        "-b", str(man["batch_size"]), "-s", str(man["step_size"]),
        "-x", str(man["xdrop_len"]), "-l", str(man["min_mss_len"]),
        "--rnn-kernel", "fused",
        "predict", os.path.join(FIXDIR, f"{name}.h5"),
        os.path.join(FIXDIR, f"{name}.fa"), "--output", str(out),
    ])
    got = [line.split("\t", 1)[1] for line in
           out.read_text().splitlines()]
    want = open(os.path.join(FIXDIR, f"{name}.bed")).read().splitlines()
    assert got == want
