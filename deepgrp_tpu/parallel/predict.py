"""Sharded window-stream inference with boundary halo exchange.

Design (SURVEY §7 step 6, BASELINE north star): the one-hot sequence is
replicated to every device; the window stream is split into contiguous
per-device ranges; each device gathers, runs the model forward and
overlap-max-merges its own windows locally (same math as the single-chip
engine), then ships the ``vecsize - step`` boundary rows that spill into the
next device's output block over ICI with ``lax.ppermute`` and max-combines.
The result equals the single-device merge exactly — the overlap-max is
associative and windows are assigned disjointly.

Everything runs in ONE ``shard_map``-ped jit call per sequence; host code
only pads window starts and trims the output.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepgrp_tpu.models.model import DeepGRPModel
from deepgrp_tpu.ops.overlap_max import overlap_max_merge
from deepgrp_tpu.parallel.mesh import DATA_AXIS
from deepgrp_tpu.predict.engine import window_starts


def _local_predict(params, seq, starts, n_valid, model: DeepGRPModel,
                   step: int, batch: int, compute_dtype):
    """Forward + merge this device's windows (runs inside shard_map).

    ``starts [W]`` with ``W`` a static multiple of ``batch``; returns the
    merged span ``[(W-1)*step + vecsize, C]``.
    """
    vecsize = model.config.vecsize
    n_windows = starts.shape[0]
    span = (n_windows - 1) * step + vecsize
    n_chunks = n_windows // batch
    chunk_span = (batch - 1) * step + vecsize

    def cut(start):
        return jax.lax.dynamic_slice(seq, (start, 0), (vecsize, 5))

    buffer = jnp.zeros((span, model.config.n_classes), dtype=jnp.float32)
    for c in range(n_chunks):
        chunk_starts = jax.lax.dynamic_slice_in_dim(starts, c * batch, batch)
        windows = jax.vmap(cut)(chunk_starts).astype(compute_dtype)
        probs = model.apply(params, windows).astype(jnp.float32)
        valid = (jnp.arange(batch) + c * batch < n_valid)[:, None, None]
        probs = jnp.where(valid, probs, 0.0)
        merged = overlap_max_merge(probs, step, chunk_span)
        offset = c * batch * step
        current = jax.lax.dynamic_slice(buffer, (offset, 0), merged.shape)
        buffer = jax.lax.dynamic_update_slice(
            buffer, jnp.maximum(current, merged), (offset, 0))
    return buffer


@partial(jax.jit,
         static_argnames=("model", "step", "batch", "mesh", "compute_dtype"))
def _sharded_predict(params, seq, starts, n_valid, model: DeepGRPModel,
                     step: int, batch: int, mesh: Mesh, compute_dtype):
    """All-device predict: returns (blocks, last_tail).

    ``starts [n_dev, W]``, ``n_valid [n_dev, 1]``.  ``blocks`` is the
    concatenated per-device output ``[n_dev * W * step, C]``; ``last_tail``
    is the final device's spill ``[vecsize - step, C]`` (or zero-width when
    step >= vecsize).
    """
    vecsize = model.config.vecsize
    n_dev = mesh.shape[DATA_AXIS]
    overlap = max(vecsize - step, 0)

    def device_fn(params, seq, starts, n_valid):
        starts_local = starts[0]
        block_rows = starts_local.shape[0] * step
        merged = _local_predict(params, seq, starts_local, n_valid[0, 0],
                                model, step, batch, compute_dtype)
        block = merged[:block_rows]
        tail = merged[block_rows:]
        if overlap:
            # Ship the spill into the next device's block head.
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            incoming = jax.lax.ppermute(tail, DATA_AXIS, perm)
            idx = jax.lax.axis_index(DATA_AXIS)
            incoming = jnp.where(idx == 0, 0.0, incoming)
            head = jnp.maximum(block[:overlap], incoming)
            block = jax.lax.dynamic_update_slice(block, head, (0, 0))
            # Only the last device's tail survives (it has no right
            # neighbor); zero the others so the gathered tail is exact.
            tail = jnp.where(idx == n_dev - 1, tail, 0.0)
        return block[None], tail[None]

    shard = jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False)
    blocks, tails = shard(params, seq, starts, n_valid)
    blocks = blocks.reshape(-1, blocks.shape[-1])
    last_tail = jnp.max(tails, axis=0) if overlap else tails[0, :0]
    return blocks, last_tail


class ShardedPredictionEngine:
    """Data-parallel windowed predictor over a device mesh."""

    def __init__(self, model: DeepGRPModel, mesh: Mesh,
                 batch_size: int = 256, step_size: int = 50,
                 compute_dtype=jnp.float32):
        self.model = model
        self.mesh = mesh
        self.batch_size = int(batch_size)
        self.step_size = int(step_size)
        self.compute_dtype = compute_dtype
        self.n_devices = mesh.shape[DATA_AXIS]

    def predict(self, params, onehot: np.ndarray,
                out_len: Optional[int] = None) -> np.ndarray:
        """Merged probabilities ``float32 [out_len, C]`` for ``[5, L]``."""
        model = self.model
        vecsize = model.config.vecsize
        step = self.step_size
        n_dev = self.n_devices
        seq_len = onehot.shape[1]
        out_len = seq_len if out_len is None else int(out_len)
        n_classes = model.config.n_classes

        starts = window_starts(seq_len, vecsize, step)
        if starts.size == 0:
            return np.zeros((out_len, n_classes), dtype=np.float32)

        # Pad per-device window count to a multiple of batch_size.
        per_dev = -(-starts.size // n_dev)
        per_dev = -(-per_dev // self.batch_size) * self.batch_size
        if per_dev * step < max(vecsize - step, 0):
            # Degenerate tiny workload: a window could spill beyond the
            # immediate neighbor's block.  Not worth sharding — run on one
            # device.
            from deepgrp_tpu.predict.engine import PredictionEngine
            engine = PredictionEngine(model, batch_size=self.batch_size,
                                      step_size=step,
                                      compute_dtype=self.compute_dtype)
            return engine.predict(params, onehot, out_len=out_len)
        total = per_dev * n_dev
        padded = np.full(total, starts[-1], dtype=np.int32)
        padded[:starts.size] = starts
        n_valid = np.zeros((n_dev, 1), dtype=np.int32)
        for d in range(n_dev):
            n_valid[d, 0] = int(
                np.clip(starts.size - d * per_dev, 0, per_dev))
        # Device d's block starts at row d*per_dev*step only if windows are
        # assigned contiguously — reshape does exactly that.
        starts_sharded = padded.reshape(n_dev, per_dev)

        seq = np.asarray(onehot.T, dtype=np.int8)
        max_start = int(padded.max())
        pad_rows = max(max_start + vecsize - seq_len, 0)
        if pad_rows:
            seq = np.pad(seq, ((0, pad_rows), (0, 0)))

        replicated = NamedSharding(self.mesh, P())
        seq_dev = jax.device_put(jnp.asarray(seq), replicated)
        params_dev = jax.device_put(params, replicated)
        sharded = NamedSharding(self.mesh, P(DATA_AXIS))
        starts_dev = jax.device_put(jnp.asarray(starts_sharded), sharded)
        nvalid_dev = jax.device_put(jnp.asarray(n_valid), sharded)

        blocks, last_tail = _sharded_predict(
            params_dev, seq_dev, starts_dev, nvalid_dev, model,
            step, self.batch_size, self.mesh, self.compute_dtype)

        blocks = np.asarray(blocks)
        last_tail = np.asarray(last_tail)
        out = np.zeros((out_len, n_classes), dtype=np.float32)
        n_rows = min(out_len, blocks.shape[0])
        out[:n_rows] = blocks[:n_rows]
        tail_lo = blocks.shape[0]
        tail_hi = min(tail_lo + last_tail.shape[0], out_len)
        if tail_hi > tail_lo:
            out[tail_lo:tail_hi] = np.maximum(out[tail_lo:tail_hi],
                                              last_tail[:tail_hi - tail_lo])
        return out
