"""Prediction post-processing: MSS application and softmax.

Parity with ``/root/reference/deepgrp/prediction.py:40-65,114-141``.
"""

from __future__ import annotations

from os import PathLike
from typing import Optional

import numpy as np

from deepgrp_tpu.config import Options
from deepgrp_tpu.data.preprocess import Data
from deepgrp_tpu.models.model import DeepGRPModel, create_model
from deepgrp_tpu.ops import mss
from deepgrp_tpu.predict.engine import PredictionEngine


def apply_mss(probs: np.ndarray, options: Options) -> np.ndarray:
    """Score and segment merged probabilities (prediction.py:40-59 parity).

    Per-position score is the clamped logit of the max probability:
    ``t = log(p/(1-p))`` with ``p = min(max_prob + 1e-6, 0.99)``;
    background-class positions are penalized ``-10*t``, repeat positions
    score ``+t``; then Ruzzo–Tompa with majority-vote labeling.
    """
    nof_labels = probs.shape[1]
    results_classes = probs.argmax(axis=1)
    mins = probs.max(axis=1) + 1e-6
    mins = np.where(mins > 0.99, 0.99, mins)
    t_scores = np.log(mins / (1 - mins))
    scores = np.where(results_classes > 0, t_scores,
                      -10 * t_scores).astype(float)
    return mss.find_mss_labels(scores, results_classes.astype(np.int64),
                               nof_labels, options.min_mss_len,
                               options.xdrop_len)


def apply_mss_scored(classes: np.ndarray, maxp: np.ndarray,
                     options: Options, nof_labels: int) -> np.ndarray:
    """``apply_mss`` from device-computed argmax/max instead of full probs.

    Bit-identical to :func:`apply_mss`: the reference computes the score
    transform on the float32 row maxima (prediction.py:53-57, numpy keeps
    float32 until the final cast), so transferring only ``max(axis=1)``
    and ``argmax(axis=1)`` loses nothing.
    """
    mins = maxp + np.float32(1e-6)
    mins = np.where(mins > 0.99, np.float32(0.99), mins)
    t_scores = np.log(mins / (1 - mins))
    scores = np.where(classes > 0, t_scores, -10 * t_scores).astype(float)
    return mss.find_mss_labels(scores, classes.astype(np.int64), nof_labels,
                               options.min_mss_len, options.xdrop_len)


def softmax(array: np.ndarray) -> np.ndarray:
    """Reference softmax (prediction.py:62-65): global max subtraction."""
    e_x = np.exp(array - np.max(array))
    return e_x / e_x.sum(axis=1, keepdims=True)


def predict_sequence(model: DeepGRPModel, params, onehot: np.ndarray,
                     options: Options, step_size: int,
                     use_mss: bool,
                     engine: Optional[PredictionEngine] = None) -> np.ndarray:
    """One-hot sequence -> per-position class array (CLI ``_predict`` core,
    __main__.py:46-83).

    The MSS path uses the transfer-light device scoring; the softmax path
    needs the full probability matrix.
    """
    if engine is None:
        engine = PredictionEngine(model, batch_size=options.batch_size,
                                  step_size=step_size)
    if use_mss:
        classes, maxp = engine.predict_scored(params, onehot)
        out = apply_mss_scored(classes, maxp, options,
                               model.config.n_classes)
    else:
        out = softmax(engine.predict(params, onehot))
    return np.asanyarray(out.argmax(axis=1))


def setup_prediction_from_options_checkpoint(options: Options,
                                             logdir: PathLike):
    """Rebuild a model and load the latest/best checkpoint weights.

    Returns ``(model, params)`` (prediction.py:68-86 equivalent; JAX has no
    implicit weight state, so parameters are explicit).
    """
    from deepgrp_tpu.train.checkpoint import latest_checkpoint_params

    model = create_model(options)
    params = latest_checkpoint_params(logdir)
    return model, params


def predict_complete(step_size: int, options: Options, logdir: PathLike,
                     data: Data, use_mss: bool = False,
                     params: Optional[dict] = None) -> np.ndarray:
    """Restore a model and predict a full sequence
    (prediction.py:114-141 parity).

    Returns one-hot MSS labels when ``use_mss`` else softmaxed
    probabilities, shaped ``[length, n_classes]``.
    """
    if params is None:
        model, params = setup_prediction_from_options_checkpoint(
            options, logdir)
    else:
        model = create_model(options)
    engine = PredictionEngine(model, batch_size=options.batch_size,
                              step_size=step_size)
    output_shape = data.truelbl.shape[::-1]
    predictions = engine.predict(params, np.asarray(data.fwd),
                                 out_len=output_shape[0])
    if use_mss:
        return apply_mss(predictions, options)
    return softmax(predictions)
