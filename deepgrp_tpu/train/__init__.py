"""Training: class-balanced sampling, optimizers, train loop, checkpoints."""

from deepgrp_tpu.train.checkpoint import (CheckpointManager,
                                          latest_checkpoint_params,
                                          load_params, save_params)
from deepgrp_tpu.train.optimizers import get_optimizer
from deepgrp_tpu.train.sampler import BatchSampler, calc_indices
from deepgrp_tpu.train.training import Trainer, training

__all__ = [
    "CheckpointManager",
    "latest_checkpoint_params",
    "load_params",
    "save_params",
    "get_optimizer",
    "BatchSampler",
    "calc_indices",
    "Trainer",
    "training",
]
