"""Sharded window-stream inference with boundary halo exchange.

Design (SURVEY §7 step 6, BASELINE north star): the block-reshaped one-hot
sequence is replicated to every device; the chunk stream is split into
contiguous per-device ranges; each device runs the same single-jit
chunk-scan as the single-chip engine (contiguous slab gathers, per-chunk
merge, spill-carry — see predict/engine.py), then ships the
``vecsize - step`` boundary rows that spill into the next device's output
block over ICI with ``lax.ppermute`` and max-combines.  The result equals
the single-device merge exactly — the overlap-max is associative and
windows are assigned disjointly.

Everything runs in ONE ``shard_map``-ped jit call per sequence; host code
only pads window starts and trims the output.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepgrp_tpu.models.model import DeepGRPModel
from deepgrp_tpu.parallel.mesh import DATA_AXIS
from deepgrp_tpu.predict.engine import (assemble_output, make_spill0,
                                        prepare_blocks, scan_chunk_range,
                                        window_starts)


@partial(jax.jit,
         static_argnames=("model", "step", "batch", "chunks_per_dev",
                          "mesh", "compute_dtype", "score"))
def _sharded_predict(params, seqblocks, n_windows, model: DeepGRPModel,
                     step: int, batch: int, chunks_per_dev: int, mesh: Mesh,
                     compute_dtype, score: bool = False):
    """All-device predict.

    Returns ``(blocks, last_tail)`` where ``blocks`` is the concatenated
    per-device output (or ``(classes, maxp)`` per-position pairs when
    ``score``) and ``last_tail`` is the final device's spill.
    """
    vecsize = model.config.vecsize
    n_dev = mesh.shape[DATA_AXIS]
    overlap = max(vecsize - step, 0)

    def device_fn(params, seqblocks, n_windows):
        dev = jax.lax.axis_index(DATA_AXIS)
        chunk0 = (dev * chunks_per_dev).astype(jnp.int32)
        block, tail = scan_chunk_range(params, seqblocks, n_windows, chunk0,
                                       make_spill0(model, step), model, step,
                                       batch, chunks_per_dev, compute_dtype)
        if overlap and n_dev > 1:
            # Ship the spill into the next device's block head.
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            incoming = jax.lax.ppermute(tail, DATA_AXIS, perm)
            incoming = jnp.where(dev == 0, 0.0, incoming)
            head = jnp.maximum(block[:overlap], incoming)
            block = jax.lax.dynamic_update_slice(block, head, (0, 0))
            # Only the last device's tail has no right neighbor; zero the
            # others so the gathered tails reduce exactly.
            tail = jnp.where(dev == n_dev - 1, tail, 0.0)
        if score:
            classes = block.argmax(axis=1).astype(jnp.int8)
            maxp = block.max(axis=1)
            return classes[None], maxp[None], tail[None]
        return block[None], tail[None]

    out_specs = ((P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)) if score
                 else (P(DATA_AXIS), P(DATA_AXIS)))
    shard = jax.shard_map(device_fn, mesh=mesh,
                          in_specs=(P(), P(), P()), out_specs=out_specs,
                          check_vma=False)
    outs = shard(params, seqblocks, n_windows)
    if score:
        classes, maxp, tails = outs
        return (classes.reshape(-1), maxp.reshape(-1),
                jnp.max(tails, axis=0) if overlap else tails[0, :0])
    blocks, tails = outs
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
        self.step_size = int(step_size)
        k = -(-model.config.vecsize // self.step_size)
        self.batch_size = max(int(batch_size), k)
        self.compute_dtype = compute_dtype
        self.n_devices = mesh.shape[DATA_AXIS]

    def _plan(self, seq_len: int):
        """(n_windows, chunks_per_dev) for a sequence length."""
        starts = window_starts(seq_len, self.model.config.vecsize,
                               self.step_size)
        if starts.size == 0:
            return 0, 0
        chunks = -(-starts.size // self.batch_size)
        chunks_per_dev = -(-chunks // self.n_devices)
        return starts.size, chunks_per_dev

    def predict(self, params, onehot: np.ndarray,
                out_len: Optional[int] = None) -> np.ndarray:
        """Merged probabilities ``float32 [out_len, C]`` for a ``[5, L]``
        one-hot or compact ``[L]`` codes sequence."""
        out_len = onehot.shape[-1] if out_len is None else int(out_len)
        n_classes = self.model.config.n_classes
        n_windows, chunks_per_dev = self._plan(onehot.shape[-1])
        if n_windows == 0:
            return np.zeros((out_len, n_classes), dtype=np.float32)
        blocks, tail = self._run(params, onehot, n_windows, chunks_per_dev,
                                 score=False)
        return assemble_output(np.asarray(blocks), np.asarray(tail),
                               out_len, n_classes)

    def predict_scored(self, params,
                       onehot: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Per-position ``(classes int8 [L], max_prob float32 [L])``."""
        out_len = onehot.shape[-1]
        n_windows, chunks_per_dev = self._plan(out_len)
        if n_windows == 0:
            return (np.zeros(out_len, np.int8),
                    np.zeros(out_len, np.float32))
        classes, maxp, tail = self._run(params, onehot, n_windows,
                                        chunks_per_dev, score=True)
        classes = np.asarray(classes)
        maxp = np.asarray(maxp)
        tail = np.asarray(tail)
        out_classes = np.zeros(out_len, np.int8)
        out_maxp = np.zeros(out_len, np.float32)
        n_rows = min(out_len, classes.shape[0])
        out_classes[:n_rows] = classes[:n_rows]
        out_maxp[:n_rows] = maxp[:n_rows]
        lo = classes.shape[0]
        hi = min(lo + tail.shape[0], out_len)
        if hi > lo:
            tail_part = tail[:hi - lo]
            out_maxp[lo:hi] = tail_part.max(axis=1)
            out_classes[lo:hi] = tail_part.argmax(axis=1).astype(np.int8)
        return out_classes, out_maxp

    def _run(self, params, onehot, n_windows: int, chunks_per_dev: int,
             score: bool):
        total_chunks = chunks_per_dev * self.n_devices
        seqblocks = prepare_blocks(onehot, self.step_size,
                                   self.model.config.vecsize,
                                   self.batch_size, total_chunks)
        replicated = NamedSharding(self.mesh, P())
        seq_dev = jax.device_put(seqblocks, replicated)
        params_dev = jax.device_put(params, replicated)
        return _sharded_predict(params_dev, seq_dev, jnp.int32(n_windows),
                                self.model, self.step_size, self.batch_size,
                                chunks_per_dev, self.mesh,
                                self.compute_dtype, score)
