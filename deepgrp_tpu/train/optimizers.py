"""Optimizer construction matching the reference's TF parameter mapping.

Parity with ``/root/reference/deepgrp/model.py:202-215``:
  * ``RMSprop``: ``momentum`` and ``rho`` map to TF RMSprop's arguments —
    ``nu = rho*nu + (1-rho)*g²``, ``m = momentum*m + lr*g/sqrt(nu+eps)``
    (epsilon inside the sqrt, as in TF2).  ``optax.rmsprop`` implements
    exactly this composition.
  * ``Adam``: ``momentum -> beta_1``, ``rho -> beta_2`` (epsilon outside
    the sqrt, as in both TF2 and optax).
  * Any other string resolves a standard optax optimizer by (lowercase)
    name with the configured learning rate — the reference passes unknown
    strings through to Keras the same way.
"""

from __future__ import annotations

import optax

from deepgrp_tpu.config import Options


def get_optimizer(options: Options) -> optax.GradientTransformation:
    name = str(options.optimizer)
    if name == "RMSprop":
        return optax.rmsprop(learning_rate=options.learning_rate,
                             decay=options.rho,
                             eps=options.epsilon,
                             momentum=(options.momentum
                                       if options.momentum else None))
    if name == "Adam":
        return optax.adam(learning_rate=options.learning_rate,
                          b1=options.momentum,
                          b2=options.rho,
                          eps=options.epsilon)
    factory = getattr(optax, name.lower(), None)
    if factory is None:
        raise ValueError(f"unknown optimizer {name!r}")
    return factory(learning_rate=options.learning_rate)
