"""Model family: weight-shared fwd/revcomp RNN classifiers.

``create_model`` builds the flagship DeepGRP architecture (BiGRU or BiLSTM
by weight sharing over the reverse complement, optional additive attention)
as a pure-JAX apply function plus a parameter pytree.
"""

from deepgrp_tpu.models.model import (DeepGRPModel, ModelConfig, create_model,
                                      reverse_complement)
from deepgrp_tpu.models.rnn import gru_apply, gru_init, lstm_apply, lstm_init

__all__ = [
    "DeepGRPModel",
    "ModelConfig",
    "create_model",
    "reverse_complement",
    "gru_apply",
    "gru_init",
    "lstm_apply",
    "lstm_init",
]
