"""The DeepGRP classifier: weight-shared fwd/revcomp RNN with attention.

Architecture parity with ``/root/reference/deepgrp/model.py:293-336``:

  input [B, T, 5]
    ├─ reverse complement (flip T, permute channels [3,2,1,0,4];
    │    model.py:240-290)
    ├─ ONE shared RNN applied to both branches  (weight sharing, not a
    │    Bidirectional wrapper: the revcomp branch output is averaged with
    │    the forward branch *without* re-flipping — model.py:309-311,321-323)
    ├─ avg = (fwd_seq + rev_seq) / 2
    ├─ if attention and GRU (model.py:308-319):
    │     hidden = (fwd_last + rev_last) / 2            -> [B, 1, u]
    │     att    = AdditiveAttention(hidden, avg)       -> [B, 1, u]
    │     feats  = concat(repeat(att, T), avg)          -> [B, T, 2u]
    │  else: feats = avg
    ├─ Dense(n_classes) logits (layer "FF")
    └─ softmax over classes

Keras ``AdditiveAttention`` semantics (use_scale=True): scores[b, t] =
sum_d scale[d] * tanh(q[b, d] + k[b, t, d]); softmax over t; output is the
attention-weighted sum of values.

Both branches run through a single RNN invocation on a doubled batch so the
recurrence is one scan of ``[2B, u]`` — better MXU utilization and one
kernel instead of two.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deepgrp_tpu.config import Options
from deepgrp_tpu.models import rnn as rnn_lib

Params = Dict[str, Any]

# DNA complement channel permutation: A<->T, C<->G, N<->N
# (model.py:233-237; encoding A=0 C=1 G=2 T=3 N=4).
COMPLEMENT_PERM = (3, 2, 1, 0, 4)


@dataclass(frozen=True)
class ModelConfig:
    """Static (hashable) architecture description for jit."""

    vecsize: int = 150
    units: int = 32
    rnn: str = "GRU"
    attention: bool = False
    n_classes: int = 5
    dropout: float = 0.25
    input_dim: int = 5

    @classmethod
    def from_options(cls, options: Options) -> "ModelConfig":
        return cls(vecsize=int(options.vecsize),
                   units=int(options.units),
                   rnn=str(options.rnn),
                   attention=bool(options.attention),
                   n_classes=len(options.repeats_to_search) + 1,
                   dropout=float(options.dropout))

    @property
    def use_attention(self) -> bool:
        # Attention only takes effect with GRU (model.py:308).
        return self.attention and self.rnn != "LSTM"

    @property
    def feature_dim(self) -> int:
        return 2 * self.units if self.use_attention else self.units


def reverse_complement(x: jax.Array) -> jax.Array:
    """Reverse the sequence axis and complement the channel axis.

    ``x`` is ``[..., T, 5]``; equivalent to the reference's
    ``tf.gather(tf.reverse(x, axis=[1]), [3,2,1,0,4], axis=2)``.
    """
    return jnp.flip(x, axis=-2)[..., jnp.array(COMPLEMENT_PERM)]


def init_params(key: jax.Array, config: ModelConfig,
                dtype=jnp.float32) -> Params:
    """Initialize parameters with Keras-default initializers."""
    k_rnn, k_att, k_dense = jax.random.split(key, 3)
    if config.rnn == "LSTM":
        rnn_params = rnn_lib.lstm_init(k_rnn, config.input_dim, config.units,
                                       dtype)
    else:
        rnn_params = rnn_lib.gru_init(k_rnn, config.input_dim, config.units,
                                      dtype)
    params: Params = {"rnn": rnn_params}
    if config.use_attention:
        params["attention"] = {
            "scale": jax.nn.initializers.glorot_uniform()(
                k_att, (config.units, 1), dtype).reshape(config.units),
        }
    params["dense"] = {
        "kernel": jax.nn.initializers.glorot_uniform()(
            k_dense, (config.feature_dim, config.n_classes), dtype),
        "bias": jnp.zeros((config.n_classes,), dtype),
    }
    return params


def additive_attention(scale: jax.Array, query: jax.Array,
                       keyvalue: jax.Array) -> jax.Array:
    """Keras AdditiveAttention with a single query vector per batch row.

    Args:
        scale: ``[u]`` learned scale.
        query: ``[B, u]``.
        keyvalue: ``[B, T, u]`` (keys == values, as in the reference where
            only ``[query, value]`` are passed).

    Returns:
        ``[B, u]`` attention output.
    """
    scores = jnp.einsum("u,btu->bt",
                        scale, jnp.tanh(query[:, None, :] + keyvalue))
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bt,btu->bu", weights, keyvalue)


def forward(params: Params, x: jax.Array, config: ModelConfig, *,
            deterministic: bool = True,
            dropout_key: Optional[jax.Array] = None,
            rnn_apply=None) -> jax.Array:
    """Apply the model to one-hot windows ``x [B, T, 5]``.

    Returns class probabilities ``[B, T, n_classes]``.

    ``rnn_apply`` optionally overrides the recurrence implementation (the
    Pallas fused kernel for TPU inference); it must have the signature of
    :func:`deepgrp_tpu.models.rnn.gru_apply`.
    """
    logits = forward_logits(params, x, config, deterministic=deterministic,
                            dropout_key=dropout_key, rnn_apply=rnn_apply)
    return jax.nn.softmax(logits, axis=-1)


def forward_logits(params: Params, x: jax.Array, config: ModelConfig, *,
                   deterministic: bool = True,
                   dropout_key: Optional[jax.Array] = None,
                   dropout_rate=None,
                   rnn_apply=None) -> jax.Array:
    """Apply the model up to (pre-softmax) logits ``[B, T, n_classes]``.

    ``dropout_rate`` overrides ``config.dropout`` (used by vmapped HPO
    trials, where the rate is a traced per-trial scalar).
    """
    batch = x.shape[0]
    if rnn_apply is None:
        rnn_apply = (rnn_lib.lstm_apply
                     if config.rnn == "LSTM" else rnn_lib.gru_apply)
    if deterministic:
        rate = 0.0
    else:
        rate = config.dropout if dropout_rate is None else dropout_rate

    both = jnp.concatenate([x, reverse_complement(x)], axis=0)
    seq, last = rnn_apply(params["rnn"], both, dropout_rate=rate,
                          dropout_key=dropout_key)
    avg = (seq[:batch] + seq[batch:]) * 0.5
    hidden = (last[:batch] + last[batch:]) * 0.5
    return _head_logits(params, avg, hidden, config,
                        "highest" if x.dtype == jnp.float32 else "default")


def _head_logits(params: Params, avg: jax.Array, hidden: jax.Array,
                 config: ModelConfig, precision: str) -> jax.Array:
    """Attention + dense head over the branch-averaged recurrence outputs
    (shared by the scan, fused-inference and fused-training paths)."""
    with jax.default_matmul_precision(precision):
        if config.use_attention:
            att = additive_attention(params["attention"]["scale"], hidden,
                                     avg)
            feats = jnp.concatenate(
                [jnp.broadcast_to(att[:, None, :], avg.shape), avg], axis=-1)
        else:
            feats = avg

        return feats @ params["dense"]["kernel"] + params["dense"]["bias"]


def forward_logits_from_codes_train(params: Params, codes: jax.Array,
                                    config: ModelConfig, *,
                                    dropout_key: Optional[jax.Array] = None,
                                    dropout_rate=None) -> jax.Array:
    """Trainable fused forward: integer code windows -> logits.

    Training fast path for BOTH cells: the fwd+revcomp recurrence (with
    Keras input dropout applied in-kernel as per-gate mask scales) runs
    through the custom-VJP Pallas kernel pairs
    (models/pallas_rnn_train.py), so the backward pass recomputes gates
    in VMEM instead of spooling ``[2B, T, n_gates*u]`` intermediates
    through HBM.  The per-gate masks are drawn from ``dropout_key``
    exactly as the scan path draws them (rnn._input_dropout_masks over
    the doubled batch — 3 masks for GRU, 4 for LSTM), so the
    regularization semantics are identical.
    """
    from deepgrp_tpu.models import rnn as rnn_lib_
    from deepgrp_tpu.models.pallas_rnn_train import (pallas_gru_avg_train,
                                                     pallas_lstm_avg_train)

    if config.rnn == "LSTM":
        rnn_train, n_gates = pallas_lstm_avg_train, 4
    else:
        rnn_train, n_gates = pallas_gru_avg_train, 3
    rate = config.dropout if dropout_rate is None else dropout_rate
    batch = codes.shape[0]
    if dropout_key is not None and (isinstance(rate, jax.Array)
                                    or rate > 0.0):
        masks = rnn_lib_._input_dropout_masks(
            dropout_key, (2 * batch, config.input_dim), rate, n_gates,
            jnp.float32)
        has_mask = True
    else:
        masks = jnp.ones((n_gates, 2 * batch, config.input_dim),
                         jnp.float32)
        has_mask = False
    avg, hidden = rnn_train(params["rnn"], codes, masks, has_mask)
    return _head_logits(params, avg, hidden, config, "highest")


def forward_probs_from_codes(params: Params, codes: jax.Array,
                             config: ModelConfig,
                             compute_dtype=jnp.float32) -> jax.Array:
    """Fused-kernel forward: integer code windows -> class probabilities.

    TPU inference fast path for both cells: the fwd+revcomp recurrence and
    branch averaging run inside one Pallas kernel (models/pallas_rnn.py:
    pallas_gru_avg / pallas_lstm_avg); only the tiny attention + dense
    head runs in XLA.  Numerically equivalent to :func:`forward` on the
    one-hot expansion of ``codes`` (the kernel's input projection is an
    exact row select), up to matmul rounding.
    """
    from deepgrp_tpu.models.pallas_rnn import (pallas_gru_avg,
                                               pallas_lstm_avg)

    rnn_avg = pallas_lstm_avg if config.rnn == "LSTM" else pallas_gru_avg
    avg, hidden = rnn_avg(params["rnn"], codes, out_dtype=compute_dtype)
    with jax.default_matmul_precision(
            "highest" if compute_dtype == jnp.float32 else "default"):
        if config.use_attention:
            att = additive_attention(
                params["attention"]["scale"].astype(compute_dtype), hidden,
                avg)
            feats = jnp.concatenate(
                [jnp.broadcast_to(att[:, None, :], avg.shape), avg], axis=-1)
        else:
            feats = avg
        logits = (feats @ params["dense"]["kernel"].astype(compute_dtype)
                  + params["dense"]["bias"].astype(compute_dtype))
    return jax.nn.softmax(logits, axis=-1)


@dataclass(frozen=True)
class DeepGRPModel:
    """Bundled config + parameter factory + apply functions."""

    config: ModelConfig

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        """Initialize parameters (Keras-default initializers).

        The init numerics run on the HOST CPU backend: threefry PRNG is
        backend-deterministic, so the values are bit-identical to a
        device-side init, while the dozens of tiny initializer jits
        compile locally in milliseconds instead of paying an accelerator
        dispatch round trip each (measured 77 s of a fresh process's
        cold start through the tunneled-TPU link).  Callers device_put
        the pytree (or let the first jit call transfer it).
        """
        if isinstance(key, jax.core.Tracer):
            # Inside a transform (e.g. the vmapped HPO fleet init): stay
            # in the traced computation.
            return init_params(key, self.config, dtype)
        try:
            # local_devices, not devices: on a multi-process run the
            # global list's first CPU device may belong to another
            # process and is not addressable here.
            cpu = jax.local_devices(backend="cpu")[0]
        except (RuntimeError, IndexError):  # no CPU backend registered
            return init_params(key, self.config, dtype)
        with jax.default_device(cpu):
            host_key = jax.device_put(jax.device_get(key), cpu)
            params = init_params(host_key, self.config, dtype)
        # Uncommitted host arrays: any later jit transfers them to its
        # own devices (committed-to-CPU arrays would clash with
        # accelerator-committed arguments instead).
        import numpy as np

        return jax.tree.map(np.asarray, params)

    def apply(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        return forward(params, x, self.config, **kwargs)

    def apply_logits(self, params: Params, x: jax.Array,
                     **kwargs) -> jax.Array:
        return forward_logits(params, x, self.config, **kwargs)


def create_model(options: Options) -> DeepGRPModel:
    """Build the model description from Options (model.py:293-336 parity)."""
    return DeepGRPModel(ModelConfig.from_options(options))
