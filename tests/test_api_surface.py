"""Every public reference entry point has a counterpart here.

One test per reference module (SURVEY.md section 2 inventory): a user
migrating from fhausmann/deepgrp must find an equivalent for each symbol
they could have imported.  This is an existence/signature check — behavior
parity is covered by the per-component test files.
"""

import inspect

import pytest


def _has_params(fn, *names):
    sig = inspect.signature(fn)
    for name in names:
        assert name in sig.parameters, (fn, name, sig)


def test_mss_module():  # reference: deepgrp.mss (pymss.pyx)
    from deepgrp_tpu.ops.mss import find_mss_labels, mss_find_all

    _has_params(find_mss_labels, "scores", "labels", "nof_labels",
                "min_mss_len", "xdrop_len")
    _has_params(mss_find_all, "scores", "min_score", "xdrop")


def test_sequence_module():  # reference: deepgrp.sequence (sequence.pyx)
    from deepgrp_tpu.ops.encoding import one_hot_encode_dna_sequence
    from deepgrp_tpu.ops.overlap_max import get_max
    from deepgrp_tpu.ops.segments import get_segments, yield_segments

    _has_params(one_hot_encode_dna_sequence, "sequence")
    _has_params(get_max, "output", "inputs", "stride")
    _has_params(get_segments, "classes", "startpos")
    _has_params(yield_segments, "classes", "start_offset")


def test_preprocessing_module():  # reference: deepgrp.preprocessing
    from deepgrp_tpu.data.preprocess import (Data, drop_start_end_n,
                                             preprocess_y)

    _has_params(preprocess_y, "filename", "chromosom", "length",
                "repeats_to_search")
    _has_params(drop_start_end_n, "fwd", "array")
    assert set(Data._fields) == {"fwd", "truelbl"}


def test_model_module():  # reference: deepgrp.model
    from deepgrp_tpu import Options, create_logdir
    from deepgrp_tpu.models import create_model
    from deepgrp_tpu.models.model import reverse_complement

    _has_params(create_model, "options")
    assert callable(create_logdir)
    options = Options()
    # Options defaults parity spot checks (model.py:76-136)
    assert options.vecsize == 150 and options.units == 32
    assert options.batch_size == 256 and options.n_epochs == 200
    assert callable(reverse_complement)


def test_training_module():  # reference: deepgrp.training
    from deepgrp_tpu.train.sampler import BatchSampler, calc_indices
    from deepgrp_tpu.train.training import training

    _has_params(training, "data", "options", "model", "logdir")
    assert callable(calc_indices)
    assert callable(BatchSampler)


def test_prediction_module():  # reference: deepgrp.prediction
    from deepgrp_tpu.predict import (apply_mss, calculate_metrics,
                                     calculate_multiclass_matthews_cc,
                                     confusion_matrix, predict_complete,
                                     softmax)
    from deepgrp_tpu.predict.engine import predict
    from deepgrp_tpu.predict.postprocess import (
        setup_prediction_from_options_checkpoint)
    from deepgrp_tpu.ops.segments import filter_segments

    _has_params(predict, "model", "params", "onehot", "results_shape",
                "step_size")
    _has_params(apply_mss, "probs", "options")
    _has_params(predict_complete, "step_size", "options", "logdir", "data",
                "use_mss")
    _has_params(setup_prediction_from_options_checkpoint, "options", "logdir")
    for fn in (calculate_metrics, confusion_matrix,
               calculate_multiclass_matthews_cc, softmax, filter_segments):
        assert callable(fn)


def test_optimization_module():  # reference: deepgrp.optimization
    from deepgrp_tpu.hpo.optimization import build_and_optimize, run_a_trial
    from deepgrp_tpu.hpo.space import reference_search_space

    _has_params(build_and_optimize, "train_data", "val_data", "step_size",
                "options", "options_dict")
    _has_params(run_a_trial, "space", "objective", "project_root_dir",
                "max_evals")
    assert callable(reference_search_space)


def test_scripts():  # reference: deepgrp._scripts + console entry points
    import tomllib

    from deepgrp_tpu.data.parse_rm import main as parse_rm_main
    from deepgrp_tpu.data.preprocess_sequence import main as preprocess_main

    assert callable(parse_rm_main)
    assert callable(preprocess_main)
    with open("pyproject.toml", "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert "deepgrp_tpu" in scripts
    assert "preprocess_sequence" in scripts
    assert "parse_rm" in scripts


def test_cli_module():  # reference: deepgrp.__main__
    from deepgrp_tpu.cli import build_parser, main

    assert callable(main)
    parser = build_parser()
    args = parser.parse_args(
        ["-b", "128", "-s", "25", "-x", "10", "-l", "20", "-t", "2",
         "predict", "model.npz", "in.fa", "--no_use_mss"])
    assert args.batch_size == 128 and args.step_size == 25
    assert args.xdrop_length == 10 and args.min_mss_length == 20
    assert args.no_use_mss


def test_new_tpu_capabilities_exported():
    # Capabilities beyond the reference that this framework promises.
    from deepgrp_tpu.ops import (find_mss_labels_device, mss_classes_device,
                                 mss_classes_from_scored, mss_find_all_device,
                                 overlap_max_merge)
    from deepgrp_tpu.parallel import (ShardedPredictionEngine,
                                      make_dp_train_step, make_mesh)
    from deepgrp_tpu.predict import PredictionEngine
    from deepgrp_tpu.hpo.vmapped import run_parallel_trials

    for fn in (find_mss_labels_device, mss_classes_device,
               mss_classes_from_scored, mss_find_all_device,
               overlap_max_merge, ShardedPredictionEngine, make_dp_train_step,
               make_mesh, PredictionEngine, run_parallel_trials):
        assert callable(fn)
