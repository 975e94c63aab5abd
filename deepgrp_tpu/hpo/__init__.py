"""Hyperparameter optimization.

The reference drives hyperopt's TPE with pickled ``Trials`` resume
(``/root/reference/deepgrp/optimization.py``).  This package provides:

  * :mod:`space` — hyperopt-style search-space primitives (uniform,
    quniform, normal, qnormal, lognormal, choice),
  * :mod:`tpe` — a self-contained Tree-structured Parzen Estimator with the
    same ``Trials``-pickle resume workflow (the environment has no
    hyperopt; the implementation follows Bergstra et al. 2011),
  * :mod:`optimization` — the train-evaluate objective and sweep driver
    with reference-parity result dicts,
  * :mod:`vmapped` — TPU-native parallel trials: same-architecture trials
    train simultaneously under one ``vmap``-ed train step,
  * :mod:`bucketed` — the full reference space (including the qnormal
    vecsize/units architecture dimensions) swept in parallel: TPE proposes
    batches, trials group by shape bucket, each bucket trains vmapped.
"""

from deepgrp_tpu.hpo.space import (choice, lognormal, normal, qnormal,
                                   quniform, uniform)
from deepgrp_tpu.hpo.tpe import STATUS_FAIL, STATUS_OK, Trials, fmin
from deepgrp_tpu.hpo.optimization import build_and_optimize, run_a_trial
from deepgrp_tpu.hpo.bucketed import run_bucketed_sweep

__all__ = [
    "uniform", "quniform", "normal", "qnormal", "lognormal", "choice",
    "Trials", "fmin", "STATUS_OK", "STATUS_FAIL",
    "build_and_optimize", "run_a_trial", "run_bucketed_sweep",
]
