"""HPO objective and sweep driver.

Parity with ``/root/reference/deepgrp/optimization.py:24-154``:
``build_and_optimize`` updates Options from the trial dict (coercing
vecsize/units to int), trains, restores the best checkpoint, runs a full
MSS-post-processed validation prediction, filters short segments, computes
metrics, and returns the hyperopt-style result dict
``{loss: -MCC | inf, status, Metrics, options, logdir, error}``; failed
trials' logdirs are deleted.  ``run_a_trial`` resumes a pickled
``results.pkl`` and appends ``max_evals`` more TPE evaluations.
"""

from __future__ import annotations

import json
import logging
import os
import pickle
import shutil
from os import PathLike, path
from typing import Any, Callable, Dict, Optional, Union

import numpy as np

from deepgrp_tpu.config import Options, create_logdir
from deepgrp_tpu.data.preprocess import Data
from deepgrp_tpu.hpo.space import Dimension
from deepgrp_tpu.hpo.tpe import STATUS_FAIL, STATUS_OK, Trials, fmin
from deepgrp_tpu.models.model import create_model
from deepgrp_tpu.ops.segments import filter_segments
from deepgrp_tpu.predict.metrics import calculate_metrics
from deepgrp_tpu.predict.postprocess import predict_complete
from deepgrp_tpu.train.training import MetricsWriter, training

_LOGGER = logging.getLogger(__name__)


def record_trial_summary(logdir: PathLike, hparams: Dict[str, Any],
                         mcc: float) -> None:
    """Persist a trial's hyperparameters + final MCC into its logdir.

    Observability parity with the reference, which writes a TensorBoard
    hparams record and a final MCC scalar per trial
    (optimization.py:54,82-88): ``hparams.json`` holds the searched
    assignment, and the MCC lands in the logdir's ``metrics.jsonl`` (and
    TB events when a writer is available).
    """
    os.makedirs(os.fspath(logdir), exist_ok=True)
    serializable = {
        key: (value.item() if isinstance(value, np.generic) else value)
        for key, value in hparams.items()
    }
    with open(path.join(os.fspath(logdir), "hparams.json"), "w") as fh:
        json.dump(serializable, fh, indent=2, sort_keys=True)
    writer = MetricsWriter(logdir, tensorboard=True)
    try:
        writer.write(step=0, metrics={"hpo/MCC": float(mcc)})
    finally:
        writer.close()


def _update_options(options: Options, dictionary: Dict[str, Any]) -> Options:
    for key, value in dictionary.items():
        options[key] = value
    options.vecsize = int(options.vecsize)
    options.units = int(options.units)
    return options


def evaluate_trained(options: Options, step_size: int, logdir: PathLike,
                     val_data: Data, params, compute_dtype=None,
                     rnn_kernel: str = "auto") -> Dict[str, Any]:
    """MSS-post-processed validation metrics for trained parameters
    (the evaluation half of the reference objective,
    optimization.py:58-68).  ``compute_dtype`` lets sweeps evaluate on
    the engine's bfloat16 fast path.

    Transport: routed through the production scored path
    (``predict_sequence`` -> packed classes+maxp slices, ~5 B/bp off
    device) instead of the reference-shaped full ``[L, C]`` float32
    probability matrix + ``[L, C]`` float64 one-hot (~40+ B/bp) — this
    sits in the inner loop of every sweep trial.  Bit-identical metrics
    (the scored routes reproduce ``apply_mss(...).argmax(axis=1)``
    exactly; tests/test_hpo.py pins the equality), except in the
    degenerate case where ``fwd`` and ``truelbl`` lengths differ, which
    keeps the legacy full-matrix path for exact parity.
    """
    from deepgrp_tpu.predict.postprocess import predict_sequence

    out_len = int(val_data.truelbl.shape[1])
    fwd = np.asarray(val_data.fwd)
    if fwd.shape[-1] != out_len:
        predictions = predict_complete(step_size, options, logdir, val_data,
                                       use_mss=True, params=params,
                                       compute_dtype=compute_dtype,
                                       rnn_kernel=rnn_kernel)
        is_not_na = np.logical_not(np.isnan(predictions[:, 0]))
        predictions_class = predictions[is_not_na].argmax(axis=1)
        filter_segments(predictions_class, options.min_mss_len)
        _, metrics = calculate_metrics(
            predictions_class, val_data.truelbl[:, is_not_na].argmax(axis=0))
        return metrics
    import jax.numpy as jnp

    from deepgrp_tpu.predict.engine import PredictionEngine

    model = create_model(options)
    engine = PredictionEngine(model, batch_size=options.batch_size,
                              step_size=step_size,
                              compute_dtype=(jnp.float32 if compute_dtype
                                             is None else compute_dtype),
                              rnn_kernel=rnn_kernel)
    predictions_class = np.asarray(
        predict_sequence(model, params, fwd, options, step_size,
                         use_mss=True, engine=engine), dtype=np.int64)
    filter_segments(predictions_class, options.min_mss_len)
    _, metrics = calculate_metrics(predictions_class,
                                   val_data.truelbl.argmax(axis=0))
    return metrics


def build_and_optimize(
        train_data: Data, val_data: Data, step_size: int, options: Options,
        options_dict: Dict[str, Union[str, float]]) -> Dict[str, Any]:
    """Train + evaluate one hyperparameter assignment (TPE objective)."""
    options = _update_options(options, options_dict)
    logdir = create_logdir(options)

    def _train_test() -> Dict[str, Any]:
        model = create_model(options)
        best_params, _ = training((train_data, val_data), options, model,
                                  logdir)
        return evaluate_trained(options, step_size, logdir, val_data,
                                best_params)

    results: Dict[str, Any] = {
        "loss": np.inf,
        "Metrics": None,
        "options": options.todict(),
        "logdir": None,
        "status": STATUS_FAIL,
        "error": "",
    }
    try:
        metrics = _train_test()
    except Exception as err:  # pylint: disable=broad-except
        _LOGGER.exception("trial raised; marking it failed")
        results["error"] = str(err)
        results["status"] = STATUS_FAIL
    else:
        results["logdir"] = logdir
        results["loss"] = -1 * metrics["MCC"]
        results["status"] = STATUS_OK
        results["Metrics"] = metrics
        if np.isnan(results["loss"]):
            results["status"] = STATUS_FAIL
            results["loss"] = np.inf
        else:
            record_trial_summary(logdir, options_dict, metrics["MCC"])
    if results["status"] == STATUS_FAIL and results["logdir"]:
        shutil.rmtree(results["logdir"], ignore_errors=True)
    return results


def _load_trials(results_path: str) -> Trials:
    if not path.exists(results_path):
        _LOGGER.info("no pickled sweep state at %s; starting a fresh one",
                     results_path)
        return Trials()
    with open(results_path, "rb") as file:
        trials = pickle.load(file)
    _LOGGER.info("resuming sweep: %d completed trials loaded from %s",
                 len(trials.trials), results_path)
    return trials


def run_a_trial(space: Dict[str, Dimension],
                objective: Callable[[Dict[str, Any]], Dict[str, Any]],
                project_root_dir: PathLike, max_evals: int,
                seed: Optional[int] = None) -> int:
    """One TPE meta-optimization increment with ``results.pkl`` resume.

    Adds ``max_evals`` evaluations on top of any previously pickled trials
    (matching the reference sweep's incremental checkpointing semantics,
    optimization.py:109-154); returns the total trial count.
    """
    results_path = path.join(project_root_dir, "results.pkl")
    trials = _load_trials(results_path)
    target_evals = len(trials.trials) + max_evals
    fmin(objective, space, trials, target_evals, seed=seed)
    with open(results_path, "wb") as file:
        pickle.dump(trials, file)
    return len(trials.losses())
