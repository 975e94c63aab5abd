"""Model numerics tests.

torch (CPU) is the independent oracle for the recurrences: torch.nn.GRU
implements exactly the same math as Keras GRU with reset_after=True (modulo
gate ordering), and torch.nn.LSTM matches Keras LSTM — so agreement here
implies agreement with the reference's TF model for imported weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepgrp_tpu.config import Options
from deepgrp_tpu.models import model as model_lib
from deepgrp_tpu.models import rnn as rnn_lib
from deepgrp_tpu.ops import encoding

torch = pytest.importorskip("torch")


def _np(a):
    return np.asarray(a, dtype=np.float32)


def make_torch_gru(params, input_dim, units):
    gru = torch.nn.GRU(input_dim, units, batch_first=True)
    kernel = _np(params["kernel"])      # [I, 3u], gate order (z, r, h)
    recurrent = _np(params["recurrent"])
    bias = _np(params["bias"])          # [2, 3u]
    u = units

    def reorder_cols(mat):  # (z, r, h) -> (r, z, n)
        return np.concatenate(
            [mat[..., u:2 * u], mat[..., :u], mat[..., 2 * u:]], axis=-1)

    with torch.no_grad():
        gru.weight_ih_l0.copy_(torch.from_numpy(reorder_cols(kernel).T))
        gru.weight_hh_l0.copy_(torch.from_numpy(reorder_cols(recurrent).T))
        gru.bias_ih_l0.copy_(torch.from_numpy(reorder_cols(bias[0])))
        gru.bias_hh_l0.copy_(torch.from_numpy(reorder_cols(bias[1])))
    return gru


def make_torch_lstm(params, input_dim, units):
    lstm = torch.nn.LSTM(input_dim, units, batch_first=True)
    with torch.no_grad():  # gate order (i, f, g/c, o) matches
        lstm.weight_ih_l0.copy_(torch.from_numpy(_np(params["kernel"]).T))
        lstm.weight_hh_l0.copy_(torch.from_numpy(_np(params["recurrent"]).T))
        lstm.bias_ih_l0.copy_(torch.from_numpy(_np(params["bias"])))
        lstm.bias_hh_l0.copy_(torch.zeros(4 * units))
    return lstm


@pytest.mark.parametrize("seed", range(3))
def test_gru_matches_torch(seed):
    key = jax.random.PRNGKey(seed)
    input_dim, units, batch, steps = 5, 32, 4, 30
    params = rnn_lib.gru_init(key, input_dim, units)
    # non-zero biases to exercise both bias rows
    params["bias"] = jax.random.normal(jax.random.PRNGKey(seed + 50),
                                       (2, 3 * units)) * 0.3
    x = jax.random.normal(jax.random.PRNGKey(seed + 100),
                          (batch, steps, input_dim))
    seq, last = rnn_lib.gru_apply(params, x)

    gru = make_torch_gru(params, input_dim, units)
    with torch.no_grad():
        t_seq, t_last = gru(torch.from_numpy(_np(x)))
    np.testing.assert_allclose(_np(seq), t_seq.numpy(), atol=2e-6)
    np.testing.assert_allclose(_np(last), t_last[0].numpy(), atol=2e-6)


@pytest.mark.parametrize("seed", range(3))
def test_lstm_matches_torch(seed):
    key = jax.random.PRNGKey(seed)
    input_dim, units, batch, steps = 5, 24, 3, 25
    params = rnn_lib.lstm_init(key, input_dim, units)
    x = jax.random.normal(jax.random.PRNGKey(seed + 100),
                          (batch, steps, input_dim))
    seq, last = rnn_lib.lstm_apply(params, x)

    lstm = make_torch_lstm(params, input_dim, units)
    with torch.no_grad():
        t_seq, (t_h, _) = lstm(torch.from_numpy(_np(x)))
    np.testing.assert_allclose(_np(seq), t_seq.numpy(), atol=2e-6)
    np.testing.assert_allclose(_np(last), t_h[0].numpy(), atol=2e-6)


def test_reverse_complement_biological():
    seq = "ACGTNACCGT"
    revcomp_seq = "ACGGTNACGT"  # biological reverse complement (N fixed)
    _, onehot = encoding.one_hot_encode_dna_sequence(seq)
    _, onehot_rc = encoding.one_hot_encode_dna_sequence(revcomp_seq)
    x = jnp.asarray(onehot.T, jnp.float32)[None]  # [1, T, 5]
    got = model_lib.reverse_complement(x)
    np.testing.assert_array_equal(_np(got[0]), onehot_rc.T)


def test_reverse_complement_involution():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 11, 5))
    twice = model_lib.reverse_complement(model_lib.reverse_complement(x))
    np.testing.assert_allclose(_np(twice), _np(x), atol=0)


def test_additive_attention_matches_naive():
    rng = np.random.default_rng(0)
    batch, steps, units = 3, 9, 8
    scale = rng.normal(size=units).astype(np.float32)
    query = rng.normal(size=(batch, units)).astype(np.float32)
    value = rng.normal(size=(batch, steps, units)).astype(np.float32)

    got = model_lib.additive_attention(jnp.asarray(scale),
                                       jnp.asarray(query),
                                       jnp.asarray(value))
    # naive: scores_t = sum_d scale_d * tanh(q_d + k_td); softmax; weighted sum
    for b in range(batch):
        scores = np.array([
            float(np.sum(scale * np.tanh(query[b] + value[b, t])))
            for t in range(steps)
        ])
        ex = np.exp(scores - scores.max())
        weights = ex / ex.sum()
        expected = (weights[:, None] * value[b]).sum(axis=0)
        np.testing.assert_allclose(_np(got[b]), expected, atol=1e-5)


@pytest.mark.parametrize("rnn,attention,feat_mult", [
    ("GRU", False, 1), ("GRU", True, 2), ("LSTM", False, 1),
    ("LSTM", True, 1),  # attention is GRU-only (model.py:308)
])
def test_forward_shapes_and_simplex(rnn, attention, feat_mult):
    options = Options(vecsize=20, units=12, rnn=rnn, attention=attention)
    model = model_lib.create_model(options)
    assert model.config.feature_dim == 12 * feat_mult
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 20, 5))
    probs = model.apply(params, x)
    assert probs.shape == (3, 20, 5)
    np.testing.assert_allclose(_np(probs.sum(-1)), np.ones((3, 20)),
                               atol=1e-6)


def test_forward_jit_and_grad():
    options = Options(vecsize=16, units=8, attention=True)
    model = model_lib.create_model(options)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 5))
    y = jax.nn.one_hot(jax.random.randint(jax.random.PRNGKey(2), (2, 16),
                                          0, 5), 5)

    @jax.jit
    def loss_fn(p):
        probs = model.apply(p, x)
        return -jnp.mean(jnp.sum(y * jnp.log(probs + 1e-8), axis=-1))

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_dropout_only_in_training_mode():
    options = Options(vecsize=16, units=8, dropout=0.5)
    model = model_lib.create_model(options)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 5))
    det = model.apply(params, x, deterministic=True)
    det2 = model.apply(params, x, deterministic=True,
                       dropout_key=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(_np(det), _np(det2))
    trn = model.apply(params, x, deterministic=False,
                      dropout_key=jax.random.PRNGKey(3))
    assert not np.allclose(_np(det), _np(trn))
