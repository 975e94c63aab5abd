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
    # Pin matmul precision: on TPU the default is bf16 and the two
    # formulations fuse differently; at "highest" they agree to the
    # f32 ulp on CPU AND on real hardware (the production kernels pin
    # highest internally).
    with jax.default_matmul_precision("highest"):
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
    with jax.default_matmul_precision("highest"):  # see test_matches_scan
        ref = model.apply(params, x)
        got = model.apply(params, x,
                          rnn_apply=make_interpret_apply(block_b=8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_rejects_dropout():
    params = rnn_lib.gru_init(jax.random.PRNGKey(0), 5, 8)
    x = jnp.zeros((2, 8, 5))
    with pytest.raises(ValueError, match="inference-only"):
        pallas_gru_apply(params, x, dropout_rate=0.5,
                         dropout_key=jax.random.PRNGKey(1), interpret=True)


@pytest.mark.parametrize("batch,steps,units,attention",
                         [(4, 17, 6, True), (8, 24, 12, False),
                          (3, 9, 5, True)])
def test_gru_avg_kernel_matches_scan_composition(batch, steps, units,
                                                 attention):
    # v2 fused kernel: codes -> (avg of fwd/revcomp branch outputs,
    # avg of final states), vs the scan + reverse_complement composition.
    from deepgrp_tpu.models.model import (ModelConfig, forward,
                                          forward_probs_from_codes,
                                          init_params, reverse_complement)
    from deepgrp_tpu.models import pallas_rnn

    rng = np.random.default_rng(batch * steps)
    codes = rng.integers(0, 5, size=(batch, steps))
    codes[0, -3:] = 4  # N channel
    config = ModelConfig(vecsize=steps, units=units, attention=attention,
                         dropout=0.0)
    params = init_params(jax.random.PRNGKey(1), config)

    onehot = np.eye(5, dtype=np.float32)[codes]
    x = jnp.asarray(onehot)
    both = jnp.concatenate([x, reverse_complement(x)], axis=0)
    seq, last = rnn_lib.gru_apply(params["rnn"], both)
    want_avg = (seq[:batch] + seq[batch:]) * 0.5
    want_hidden = (last[:batch] + last[batch:]) * 0.5

    avg, hidden = pallas_rnn.pallas_gru_avg(params["rnn"],
                                            jnp.asarray(codes),
                                            block_b=8, time_block=8,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(avg), np.asarray(want_avg),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(want_hidden),
                               atol=1e-5)


@pytest.mark.parametrize("batch,steps,units", [(4, 17, 6), (8, 24, 12),
                                               (3, 9, 5)])
def test_lstm_avg_kernel_matches_scan_composition(batch, steps, units):
    # LSTM leg of the fused kernel vs the scan + reverse_complement
    # composition (attention is GRU-only, so only avg/hidden matter).
    from deepgrp_tpu.models.model import (ModelConfig, init_params,
                                          reverse_complement)
    from deepgrp_tpu.models import pallas_rnn

    rng = np.random.default_rng(batch * steps + 1)
    codes = rng.integers(0, 5, size=(batch, steps))
    codes[0, -3:] = 4  # N channel
    config = ModelConfig(vecsize=steps, units=units, rnn="LSTM",
                         dropout=0.0)
    params = init_params(jax.random.PRNGKey(3), config)

    onehot = np.eye(5, dtype=np.float32)[codes]
    x = jnp.asarray(onehot)
    both = jnp.concatenate([x, reverse_complement(x)], axis=0)
    seq, last = rnn_lib.lstm_apply(params["rnn"], both)
    want_avg = (seq[:batch] + seq[batch:]) * 0.5
    want_hidden = (last[:batch] + last[batch:]) * 0.5

    avg, hidden = pallas_rnn.pallas_lstm_avg(params["rnn"],
                                             jnp.asarray(codes),
                                             block_b=8, time_block=8,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(avg), np.asarray(want_avg),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(want_hidden),
                               atol=1e-5)


def test_forward_probs_from_codes_matches_forward_lstm(monkeypatch):
    # Fused LSTM forward (interpreter mode) == scan forward.
    from deepgrp_tpu.models import pallas_rnn
    from deepgrp_tpu.models.model import (ModelConfig, forward,
                                          forward_probs_from_codes,
                                          init_params)

    real = pallas_rnn.pallas_lstm_avg

    def interp(params, codes, **kw):
        kw["interpret"] = True
        kw.setdefault("block_b", 8)
        return real(params, codes, **kw)

    monkeypatch.setattr(pallas_rnn, "pallas_lstm_avg", interp)
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 5, size=(4, 30))
    config = ModelConfig(vecsize=30, units=6, rnn="LSTM", dropout=0.0)
    params = init_params(jax.random.PRNGKey(4), config)
    want = forward(params,
                   jnp.asarray(np.eye(5, dtype=np.float32)[codes]), config)
    got = forward_probs_from_codes(params, jnp.asarray(codes), config)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_forward_probs_from_codes_matches_forward(monkeypatch):
    # Full fused forward (kernel in interpreter mode) == scan forward.
    from deepgrp_tpu.models import pallas_rnn
    from deepgrp_tpu.models.model import (ModelConfig, forward,
                                          forward_probs_from_codes,
                                          init_params)

    real = pallas_rnn.pallas_gru_avg

    def interp(params, codes, **kw):
        kw["interpret"] = True
        kw.setdefault("block_b", 8)
        return real(params, codes, **kw)

    monkeypatch.setattr(pallas_rnn, "pallas_gru_avg", interp)
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 5, size=(4, 30))
    config = ModelConfig(vecsize=30, units=6, attention=True, dropout=0.0)
    params = init_params(jax.random.PRNGKey(2), config)
    want = forward(params,
                   jnp.asarray(np.eye(5, dtype=np.float32)[codes]), config)
    got = forward_probs_from_codes(params, jnp.asarray(codes), config)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
