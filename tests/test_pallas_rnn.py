"""Pallas GRU kernel correctness (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepgrp_tpu.models import rnn as rnn_lib
from deepgrp_tpu.models.pallas_rnn import pallas_gru_apply


@pytest.mark.parametrize("batch,steps,units,block_b", [
    (7, 23, 60, 4),    # ragged batch/time vs block sizes
    (8, 16, 12, 8),    # exact tiling
    (3, 5, 8, 16),     # batch smaller than block
])
def test_matches_scan(batch, steps, units, block_b):
    key = jax.random.PRNGKey(0)
    params = rnn_lib.gru_init(key, 5, units)
    params["bias"] = jax.random.normal(jax.random.PRNGKey(1),
                                       (2, 3 * units)) * 0.3
    x = jax.random.uniform(jax.random.PRNGKey(2), (batch, steps, 5))
    seq_ref, last_ref = rnn_lib.gru_apply(params, x)
    seq_pl, last_pl = pallas_gru_apply(params, x, interpret=True,
                                       block_b=block_b)
    np.testing.assert_allclose(np.asarray(seq_pl), np.asarray(seq_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(last_pl), np.asarray(last_ref),
                               atol=1e-6)


def test_model_forward_with_pallas_rnn():
    from deepgrp_tpu.config import Options
    from deepgrp_tpu.models import create_model
    from deepgrp_tpu.models.pallas_rnn import make_interpret_apply

    options = Options(vecsize=16, units=8, attention=True)
    model = create_model(options)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 5))
    ref = model.apply(params, x)
    got = model.apply(params, x, rnn_apply=make_interpret_apply(block_b=8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_rejects_dropout():
    params = rnn_lib.gru_init(jax.random.PRNGKey(0), 5, 8)
    x = jnp.zeros((2, 8, 5))
    with pytest.raises(ValueError, match="inference-only"):
        pallas_gru_apply(params, x, dropout_rate=0.5,
                         dropout_key=jax.random.PRNGKey(1), interpret=True)
