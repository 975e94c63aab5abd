"""On-device sliding-window prediction engine.

Replaces the reference's host-side generator + per-batch-callback loop
(``/root/reference/deepgrp/prediction.py:14-37,89-111``) with an HBM-resident
pipeline: the one-hot chromosome stays on device as ``int8 [L, 5]``; each
chunk of windows is gathered with ``vmap(dynamic_slice)``, run through the
RNN forward, merged with the shifted overlap-max, and max-combined into a
donated genome-length accumulator — all inside a single ``jit`` per chunk.
Host code only slices chunk indices.

Window enumeration parity with the reference
(``prediction.py:31``): window starts are ``range(0, L - vecsize,
step_size)`` — note the window starting exactly at ``L - vecsize`` is
excluded, and sequences with ``L <= vecsize`` produce zero windows (the
result is then an all-zero probability array).

Divergence from the reference (documented): the reference misplaces the
final partial batch when the window count is not a multiple of the batch
size (``prediction.py:105`` computes the merge offset from the *current*
batch's size).  This engine places every window at its true offset
``i * step_size``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepgrp_tpu.models.model import DeepGRPModel
from deepgrp_tpu.ops.overlap_max import overlap_max_merge


def window_starts(seq_len: int, vecsize: int, step_size: int) -> np.ndarray:
    """Reference-parity window start positions (prediction.py:31)."""
    return np.arange(0, max(seq_len - vecsize, 0), step_size, dtype=np.int32)


@partial(jax.jit, static_argnames=("model", "step", "span", "compute_dtype"),
         donate_argnums=(3,))
def _chunk_step(params, seq: jax.Array, starts: jax.Array, buffer: jax.Array,
                n_valid: jax.Array, offset: jax.Array, model: DeepGRPModel,
                step: int, span: int, compute_dtype) -> jax.Array:
    """Gather, forward, merge and accumulate one chunk of windows.

    Args:
        params: model parameters.
        seq: ``int8 [L_padded, 5]`` one-hot sequence (device resident).
        starts: ``int32 [B]`` window start positions (clamped for padding).
        buffer: ``float32 [L_buf, C]`` merged-probability accumulator
            (donated; updated in place by XLA).
        n_valid: number of real windows in this chunk (rest are padding).
        offset: position of this chunk's first output row in ``buffer``.
        model: static model bundle.
        step: window step size.
        span: static merged-chunk length ``(B-1)*step + vecsize``.
        compute_dtype: forward dtype (float32 for parity, bfloat16 for speed).
    """
    vecsize = model.config.vecsize

    def cut(start):
        return jax.lax.dynamic_slice(seq, (start, 0), (vecsize, 5))

    windows = jax.vmap(cut)(starts).astype(compute_dtype)
    probs = model.apply(params, windows).astype(jnp.float32)
    # Null out padding windows: the merge is a max against a >= 0 buffer,
    # so all-zero windows are no-ops.
    valid = (jnp.arange(probs.shape[0]) < n_valid)[:, None, None]
    probs = jnp.where(valid, probs, 0.0)
    merged = overlap_max_merge(probs, step, span)
    current = jax.lax.dynamic_slice(buffer, (offset, 0), merged.shape)
    return jax.lax.dynamic_update_slice(buffer, jnp.maximum(current, merged),
                                        (offset, 0))


class PredictionEngine:
    """Reusable jit-compiled windowed predictor for one model config."""

    def __init__(self, model: DeepGRPModel, batch_size: int = 256,
                 step_size: int = 50, compute_dtype=jnp.float32):
        self.model = model
        self.batch_size = int(batch_size)
        self.step_size = int(step_size)
        self.compute_dtype = compute_dtype

    def predict(self, params, onehot: np.ndarray,
                out_len: Optional[int] = None) -> np.ndarray:
        """Predict merged class probabilities for a full sequence.

        Args:
            params: model parameters (host or device pytree).
            onehot: ``[5, L]`` one-hot sequence (the reference layout).
            out_len: length of the output array (defaults to L; parity with
                ``results_shape`` in prediction.py:90).

        Returns:
            ``float32 [out_len, n_classes]`` overlap-max merged
            probabilities (zeros where no window coverage).
        """
        vecsize = self.model.config.vecsize
        n_classes = self.model.config.n_classes
        step = self.step_size
        batch = self.batch_size
        seq_len = onehot.shape[1]
        out_len = seq_len if out_len is None else int(out_len)

        starts = window_starts(seq_len, vecsize, step)
        n_windows = starts.size
        if n_windows == 0:
            return np.zeros((out_len, n_classes), dtype=np.float32)

        n_chunks = -(-n_windows // batch)
        span = (batch - 1) * step + vecsize
        # Buffer covers every chunk's span; trimmed to out_len at the end.
        buf_len = max(out_len, (n_chunks - 1) * batch * step + span)
        # Sequence padded so clamped padding windows stay in bounds.
        seq = jnp.asarray(onehot.T, dtype=jnp.int8)
        max_start = int(starts[-1])
        pad_rows = max(max_start + vecsize - seq_len, 0)
        if pad_rows:
            seq = jnp.pad(seq, ((0, pad_rows), (0, 0)))

        buffer = jnp.zeros((buf_len, n_classes), dtype=jnp.float32)
        padded = np.zeros(n_chunks * batch, dtype=np.int32)
        padded[:n_windows] = starts
        padded[n_windows:] = starts[-1]  # clamped; masked out in the kernel

        for c in range(n_chunks):
            chunk = jnp.asarray(padded[c * batch:(c + 1) * batch])
            n_valid = jnp.int32(min(n_windows - c * batch, batch))
            offset = jnp.int32(c * batch * step)
            buffer = _chunk_step(params, seq, chunk, buffer, n_valid, offset,
                                 self.model, step, span, self.compute_dtype)
        return np.asarray(buffer[:out_len])


def predict(model: DeepGRPModel, params, onehot: np.ndarray,
            results_shape: Tuple[int, int], step_size: int,
            batch_size: int = 256) -> np.ndarray:
    """Functional one-shot API mirroring the reference ``predict``
    (prediction.py:89-111): returns ``float32 [results_shape]`` merged
    probabilities for ``onehot [5, L]``."""
    engine = PredictionEngine(model, batch_size=batch_size,
                              step_size=step_size)
    out = engine.predict(params, onehot, out_len=results_shape[0])
    assert out.shape[1] == results_shape[1]
    return out
