"""GRU / LSTM recurrences as JAX scans with Keras-compatible numerics.

The parameter layout and gate math match TF2 Keras exactly so reference
HDF5 weights import losslessly:

  * GRU (``reset_after=True``, the TF2 default used by the reference's
    ``keras.layers.GRU`` at ``/root/reference/deepgrp/model.py:225-229``):
    gate order (z, r, h), ``kernel [I, 3u]``, ``recurrent [u, 3u]``,
    ``bias [2, 3u]`` (input bias row 0, recurrent bias row 1), with
      z = sigmoid(xW_z + b_iz + hU_z + b_rz)
      r = sigmoid(xW_r + b_ir + hU_r + b_rr)
      hh = tanh(xW_h + b_ih + r * (hU_h + b_rh))
      h' = z*h + (1-z)*hh
    (identical math to ``torch.nn.GRU`` modulo gate ordering, which the
    tests exploit as an independent oracle).

  * LSTM: gate order (i, f, c, o), ``kernel [I, 4u]``, ``recurrent
    [u, 4u]``, ``bias [4u]`` with unit forget bias at init.

Input projections for all timesteps are computed as one large matmul
(MXU-friendly) before the scan; the scan carries only the ``[B, u]`` hidden
state.  A fused Pallas TPU kernel with the same contract lives in
``deepgrp_tpu.models.pallas_rnn`` and is used for inference on TPU.

Dropout reproduces Keras RNN input-dropout semantics: per-gate masks on the
inputs, shared across timesteps (3 masks for GRU, 4 for LSTM).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


def gru_init(key: jax.Array, input_dim: int, units: int,
             dtype=jnp.float32) -> Params:
    """Keras-default initialization: glorot kernel, orthogonal recurrent."""
    k_kernel, k_rec = jax.random.split(key)
    kernel = jax.nn.initializers.glorot_uniform()(
        k_kernel, (input_dim, 3 * units), dtype)
    recurrent = jax.nn.initializers.orthogonal()(
        k_rec, (units, 3 * units), dtype)
    bias = jnp.zeros((2, 3 * units), dtype)
    return {"kernel": kernel, "recurrent": recurrent, "bias": bias}


def lstm_init(key: jax.Array, input_dim: int, units: int,
              dtype=jnp.float32) -> Params:
    """Keras-default initialization incl. unit forget bias."""
    k_kernel, k_rec = jax.random.split(key)
    kernel = jax.nn.initializers.glorot_uniform()(
        k_kernel, (input_dim, 4 * units), dtype)
    recurrent = jax.nn.initializers.orthogonal()(
        k_rec, (units, 4 * units), dtype)
    bias = jnp.zeros((4 * units,), dtype)
    bias = bias.at[units:2 * units].set(1.0)  # forget gate
    return {"kernel": kernel, "recurrent": recurrent, "bias": bias}


def _input_dropout_masks(key: jax.Array, shape: Tuple[int, int], rate,
                         count: int, dtype) -> jax.Array:
    keep = 1.0 - rate  # rate may be a traced scalar (vmapped HPO trials)
    mask = jax.random.bernoulli(key, keep, (count,) + shape)
    return mask.astype(dtype) / keep


def _matmul_precision(x: jax.Array) -> str:
    # float32 runs ask the MXU for full precision (parity with the CPU/TF
    # reference); bfloat16 runs take the fast path.
    return "highest" if x.dtype == jnp.float32 else "default"


def gru_apply(params: Params, x: jax.Array, *,
              dropout_rate: float = 0.0,
              dropout_key: Optional[jax.Array] = None,
              unroll: int = 8) -> Tuple[jax.Array, jax.Array]:
    """Run the GRU over ``x [B, T, I]``.

    Returns ``(sequence [B, T, u], last_state [B, u])``.
    """
    with jax.default_matmul_precision(_matmul_precision(x)):
        return _gru_apply(params, x, dropout_rate=dropout_rate,
                          dropout_key=dropout_key, unroll=unroll)


def _use_dropout(rate, key) -> bool:
    """Whether to take the masked path.

    A traced (vmapped-over) rate always takes it — rate 0 then degenerates
    to an all-ones mask, preserving semantics.
    """
    if key is None:
        return False
    if isinstance(rate, jax.Array):
        return True
    return rate > 0.0


def _gru_apply(params: Params, x: jax.Array, *,
               dropout_rate, dropout_key: Optional[jax.Array],
               unroll: int) -> Tuple[jax.Array, jax.Array]:
    units = params["recurrent"].shape[0]
    bias_in, bias_rec = params["bias"][0], params["bias"][1]

    if _use_dropout(dropout_rate, dropout_key):
        # Per-gate masked input projections (Keras: 3 masks, shared over T).
        masks = _input_dropout_masks(dropout_key, (x.shape[0], x.shape[2]),
                                     dropout_rate, 3, x.dtype)
        kernel = params["kernel"].reshape(x.shape[2], 3, units)
        projs = [(x * masks[g][:, None, :]) @ kernel[:, g, :]
                 for g in range(3)]
        xproj = jnp.concatenate(projs, axis=-1) + bias_in
    else:
        xproj = x @ params["kernel"] + bias_in

    recurrent = params["recurrent"]

    def step(h, xp_t):
        rproj = h @ recurrent + bias_rec
        z = jax.nn.sigmoid(xp_t[..., :units] + rproj[..., :units])
        r = jax.nn.sigmoid(xp_t[..., units:2 * units] +
                           rproj[..., units:2 * units])
        hh = jnp.tanh(xp_t[..., 2 * units:] + r * rproj[..., 2 * units:])
        h_new = z * h + (1.0 - z) * hh
        return h_new, h_new

    h0 = jnp.zeros((x.shape[0], units), dtype=xproj.dtype)
    last, seq = jax.lax.scan(step, h0, xproj.swapaxes(0, 1), unroll=unroll)
    return seq.swapaxes(0, 1), last


def lstm_apply(params: Params, x: jax.Array, *,
               dropout_rate: float = 0.0,
               dropout_key: Optional[jax.Array] = None,
               unroll: int = 8) -> Tuple[jax.Array, jax.Array]:
    """Run the LSTM over ``x [B, T, I]``.

    Returns ``(sequence [B, T, u], last_hidden [B, u])``.
    """
    with jax.default_matmul_precision(_matmul_precision(x)):
        return _lstm_apply(params, x, dropout_rate=dropout_rate,
                           dropout_key=dropout_key, unroll=unroll)


def _lstm_apply(params: Params, x: jax.Array, *,
                dropout_rate, dropout_key: Optional[jax.Array],
                unroll: int) -> Tuple[jax.Array, jax.Array]:
    units = params["recurrent"].shape[0]
    bias = params["bias"]

    if _use_dropout(dropout_rate, dropout_key):
        masks = _input_dropout_masks(dropout_key,
                                     (x.shape[0], x.shape[2]),
                                     dropout_rate, 4, x.dtype)
        kernel = params["kernel"].reshape(x.shape[2], 4, units)
        projs = [(x * masks[g][:, None, :]) @ kernel[:, g, :]
                 for g in range(4)]
        xproj = jnp.concatenate(projs, axis=-1) + bias
    else:
        xproj = x @ params["kernel"] + bias

    recurrent = params["recurrent"]

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + h @ recurrent
        i = jax.nn.sigmoid(gates[..., :units])
        f = jax.nn.sigmoid(gates[..., units:2 * units])
        g = jnp.tanh(gates[..., 2 * units:3 * units])
        o = jax.nn.sigmoid(gates[..., 3 * units:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    zeros = jnp.zeros((x.shape[0], units), dtype=xproj.dtype)
    (last, _), seq = jax.lax.scan(step, (zeros, zeros),
                                  xproj.swapaxes(0, 1), unroll=unroll)
    return seq.swapaxes(0, 1), last
