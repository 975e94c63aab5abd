"""Trainable fused GRU/LSTM kernels: forward + gradient equality vs the
scan.

All kernels run through the Pallas interpreter on CPU; Mosaic compilation
is exercised on hardware (benchmarks/train_kernel_bench.py and the CI
tpu-parity job).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepgrp_tpu.models import rnn as rnn_lib
from deepgrp_tpu.models.model import reverse_complement
from deepgrp_tpu.models.pallas_rnn_train import (pallas_gru_avg_train,
                                                 pallas_lstm_avg_train)


def _setup(batch, steps, units, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 5, size=(batch, steps))
    codes[0, :2] = 4  # N channel
    codes[-1, -2:] = 5  # zero-row (pad) positions inside a window
    params = rnn_lib.gru_init(jax.random.PRNGKey(seed), 5, units)
    params["bias"] = jax.random.normal(jax.random.PRNGKey(seed + 1),
                                       (2, 3 * units)) * 0.3
    onehot = np.zeros((batch, steps, 5), np.float32)
    valid = codes < 5
    onehot[np.nonzero(valid)[0], np.nonzero(valid)[1], codes[valid]] = 1.0
    return jnp.asarray(codes), params, jnp.asarray(onehot)


def _scan_avg(params, x, rate=0.0, key=None):
    both = jnp.concatenate([x, reverse_complement(x)], axis=0)
    seq, last = rnn_lib.gru_apply(params["rnn"] if "rnn" in params
                                  else params, both, dropout_rate=rate,
                                  dropout_key=key)
    b = x.shape[0]
    return (seq[:b] + seq[b:]) * 0.5, (last[:b] + last[b:]) * 0.5


@pytest.mark.parametrize("batch,steps,units", [(4, 19, 6), (8, 16, 12)])
def test_train_fwd_matches_scan_deterministic(batch, steps, units):
    codes, params, onehot = _setup(batch, steps, units, 3)
    want_avg, want_hid = _scan_avg(params, onehot)
    masks = jnp.ones((3, 2 * batch, 5), jnp.float32)
    avg, hid = pallas_gru_avg_train(params, codes, masks, False)
    np.testing.assert_allclose(np.asarray(avg), np.asarray(want_avg),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hid), np.asarray(want_hid),
                               atol=1e-5)


@pytest.mark.parametrize("batch,steps,units,rate", [
    (4, 19, 6, 0.0),
    (4, 19, 6, 0.3),
    (8, 16, 12, 0.0928),
])
def test_train_kernel_grads_match_scan(batch, steps, units, rate):
    codes, params, onehot = _setup(batch, steps, units, 7)
    key = jax.random.PRNGKey(11) if rate > 0 else None
    # The scan path draws its per-gate masks from `key`; draw the SAME
    # masks for the kernel (identical call -> identical values).
    if rate > 0:
        masks = rnn_lib._input_dropout_masks(key, (2 * batch, 5), rate, 3,
                                             jnp.float32)
        has_mask = True
    else:
        masks = jnp.ones((3, 2 * batch, 5), jnp.float32)
        has_mask = False
    w_avg = jax.random.normal(jax.random.PRNGKey(1), (batch, steps, units))
    w_hid = jax.random.normal(jax.random.PRNGKey(2), (batch, units))

    def loss_scan(p):
        avg, hid = _scan_avg(p, onehot, rate, key)
        return jnp.sum(avg * w_avg) + jnp.sum(hid * w_hid)

    def loss_kernel(p):
        avg, hid = pallas_gru_avg_train(p, codes, masks, has_mask)
        return jnp.sum(avg * w_avg) + jnp.sum(hid * w_hid)

    v_s, g_s = jax.value_and_grad(loss_scan)(params)
    v_k, g_k = jax.value_and_grad(loss_kernel)(params)
    np.testing.assert_allclose(float(v_k), float(v_s), rtol=1e-5)
    for name in ("kernel", "recurrent", "bias"):
        np.testing.assert_allclose(np.asarray(g_k[name]),
                                   np.asarray(g_s[name]), atol=2e-4,
                                   err_msg=name)


def _setup_lstm(batch, steps, units, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 5, size=(batch, steps))
    codes[0, :2] = 4
    codes[-1, -2:] = 5
    params = rnn_lib.lstm_init(jax.random.PRNGKey(seed), 5, units)
    params["bias"] = params["bias"] + jax.random.normal(
        jax.random.PRNGKey(seed + 1), (4 * units,)) * 0.3
    onehot = np.zeros((batch, steps, 5), np.float32)
    valid = codes < 5
    onehot[np.nonzero(valid)[0], np.nonzero(valid)[1], codes[valid]] = 1.0
    return jnp.asarray(codes), params, jnp.asarray(onehot)


def _scan_avg_lstm(params, x, rate=0.0, key=None):
    both = jnp.concatenate([x, reverse_complement(x)], axis=0)
    seq, last = rnn_lib.lstm_apply(params, both, dropout_rate=rate,
                                   dropout_key=key)
    b = x.shape[0]
    return (seq[:b] + seq[b:]) * 0.5, (last[:b] + last[b:]) * 0.5


@pytest.mark.parametrize("batch,steps,units", [(4, 19, 6), (8, 16, 12)])
def test_lstm_train_fwd_matches_scan_deterministic(batch, steps, units):
    codes, params, onehot = _setup_lstm(batch, steps, units, 5)
    want_avg, want_hid = _scan_avg_lstm(params, onehot)
    masks = jnp.ones((4, 2 * batch, 5), jnp.float32)
    avg, hid = pallas_lstm_avg_train(params, codes, masks, False)
    np.testing.assert_allclose(np.asarray(avg), np.asarray(want_avg),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hid), np.asarray(want_hid),
                               atol=1e-5)


@pytest.mark.parametrize("batch,steps,units,rate", [
    (4, 19, 6, 0.0),
    (4, 19, 6, 0.3),
    (8, 16, 12, 0.0928),
])
def test_lstm_train_kernel_grads_match_scan(batch, steps, units, rate):
    codes, params, onehot = _setup_lstm(batch, steps, units, 9)
    key = jax.random.PRNGKey(13) if rate > 0 else None
    if rate > 0:
        masks = rnn_lib._input_dropout_masks(key, (2 * batch, 5), rate, 4,
                                             jnp.float32)
        has_mask = True
    else:
        masks = jnp.ones((4, 2 * batch, 5), jnp.float32)
        has_mask = False
    w_avg = jax.random.normal(jax.random.PRNGKey(1), (batch, steps, units))
    w_hid = jax.random.normal(jax.random.PRNGKey(2), (batch, units))

    def loss_scan(p):
        avg, hid = _scan_avg_lstm(p, onehot, rate, key)
        return jnp.sum(avg * w_avg) + jnp.sum(hid * w_hid)

    def loss_kernel(p):
        avg, hid = pallas_lstm_avg_train(p, codes, masks, has_mask)
        return jnp.sum(avg * w_avg) + jnp.sum(hid * w_hid)

    v_s, g_s = jax.value_and_grad(loss_scan)(params)
    v_k, g_k = jax.value_and_grad(loss_kernel)(params)
    np.testing.assert_allclose(float(v_k), float(v_s), rtol=1e-5)
    for name in ("kernel", "recurrent", "bias"):
        np.testing.assert_allclose(np.asarray(g_k[name]),
                                   np.asarray(g_s[name]), atol=2e-4,
                                   err_msg=name)
