"""Windowed inference engine, MSS application and evaluation metrics."""

from deepgrp_tpu.predict.engine import PredictionEngine, predict
from deepgrp_tpu.predict.postprocess import (apply_mss, apply_mss_scored,
                                             predict_complete,
                                             predict_sequence,
                                             setup_prediction_from_options_checkpoint,
                                             softmax)
from deepgrp_tpu.predict.metrics import (calculate_metrics,
                                         calculate_multiclass_matthews_cc,
                                         confusion_matrix)
from deepgrp_tpu.ops.segments import filter_segments

__all__ = [
    "PredictionEngine",
    "predict",
    "apply_mss",
    "apply_mss_scored",
    "softmax",
    "predict_complete",
    "predict_sequence",
    "setup_prediction_from_options_checkpoint",
    "calculate_metrics",
    "calculate_multiclass_matthews_cc",
    "confusion_matrix",
    "filter_segments",
]
