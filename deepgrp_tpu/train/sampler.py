"""Class-balanced window sampler, on-device.

Reference semantics (``/root/reference/deepgrp/training.py:76-132``): per
repeat class, candidate window starts are positions whose ``vecsize`` window
overlaps at least one labeled position (cumsum rolling-window trick,
``_calc_indices``); each batch draws ``one_class_size =
int(batch_size * repeat_probability / n_repeat_classes)`` starts per class
with enough candidates, fills the rest uniformly, shuffles, and gathers
``[B, vecsize]`` transposed slices of the one-hot sequence and labels.

TPU-native design: the candidate index arrays are computed once on the host
(numpy) and padded into a dense ``[n_classes, max_candidates]`` device
matrix; per-batch index sampling and the window gathers run under ``jit``
with explicit PRNG keys (the reference uses unseeded global numpy RNG, so
parity is at the distribution level — SURVEY §7 "Sampler reproducibility").
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepgrp_tpu.config import Options
from deepgrp_tpu.data.preprocess import Data


def calc_indices(array: np.ndarray, vecsize: int) -> np.ndarray:
    """Candidate window starts overlapping labeled positions
    (training.py:76-81 parity, including the ``> 0`` start filter)."""
    sums = array.cumsum()
    sums[vecsize:] = sums[vecsize:] - sums[:-vecsize]
    indices = np.where(sums > 0)[0] - vecsize
    indices = indices[indices > 0]
    return indices


class BatchSampler:
    """Stateless-per-key batch sampler bound to one dataset."""

    def __init__(self, options: Options, data: Data):
        self.vecsize = int(options.vecsize)
        self.batch_size = int(options.batch_size)
        n_label_rows = data.truelbl.shape[0]
        self.n_classes = n_label_rows
        self.one_class_size = int(options.batch_size *
                                  options.repeat_probability /
                                  (n_label_rows - 1))
        self.seq_len = int(data.fwd.shape[1])

        candidates = [
            calc_indices(np.asarray(data.truelbl[i]), self.vecsize)
            for i in range(1, n_label_rows)
        ]
        candidates = [c for c in candidates if c.size > self.one_class_size]
        self.n_sampled_classes = len(candidates)
        self.filled = self.one_class_size * len(candidates)
        if self.filled > self.batch_size:
            raise ValueError("repeat_probability * batch_size exceeds batch")

        max_len = max((c.size for c in candidates), default=1)
        cand = np.zeros((max(len(candidates), 1), max_len), dtype=np.int32)
        lens = np.ones(max(len(candidates), 1), dtype=np.int32)
        for i, c in enumerate(candidates):
            cand[i, :c.size] = c
            lens[i] = c.size
        self._candidates = jnp.asarray(cand)
        self._lengths = jnp.asarray(lens)

        # Device-resident [L, channels] layouts for fast window gathers.
        self._fwd = jnp.asarray(np.asarray(data.fwd).T, dtype=jnp.int8)
        self._lbl = jnp.asarray(np.asarray(data.truelbl).T, dtype=jnp.int8)

    def sample_starts(self, key: jax.Array) -> jax.Array:
        """Sample a shuffled ``[batch_size]`` vector of window starts."""
        return _sample_starts(key, self._candidates, self._lengths,
                              self.n_sampled_classes, self.one_class_size,
                              self.batch_size, self.seq_len, self.vecsize)

    def gather(self, starts: jax.Array,
               dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
        """Gather ``([B, V, 5], [B, V, n_classes])`` windows for starts."""
        return _gather(self._fwd, self._lbl, starts, self.vecsize, dtype)

    def batch(self, key: jax.Array,
              dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
        """One class-balanced batch ``(x, y)``."""
        return self.gather(self.sample_starts(key), dtype)


@partial(jax.jit,
         static_argnames=("n_sampled", "ocs", "batch", "seq_len", "vecsize"))
def _sample_starts(key, candidates, lengths, n_sampled: int, ocs: int,
                   batch: int, seq_len: int, vecsize: int) -> jax.Array:
    key_cls, key_uni, key_perm = jax.random.split(key, 3)
    parts = []
    if n_sampled:
        picks = jax.random.randint(key_cls, (n_sampled, ocs), 0, 1 << 30)
        picks = picks % lengths[:n_sampled, None]
        parts.append(jnp.take_along_axis(candidates[:n_sampled], picks,
                                         axis=1).reshape(-1))
    n_uniform = batch - n_sampled * ocs
    if n_uniform:
        parts.append(
            jax.random.randint(key_uni, (n_uniform,), 0, seq_len - vecsize))
    starts = jnp.concatenate(parts).astype(jnp.int32)
    return jax.random.permutation(key_perm, starts)


def _sample_starts_dp(key, candidates, lengths, n_sampled: int,
                      ocs_global: int, n_dev: int, dev_idx, local_batch: int,
                      seq_len: int, vecsize: int) -> jax.Array:
    """Per-device slice of the class-balanced batch with EXACT global
    class totals (called inside ``shard_map``; ``dev_idx`` is the traced
    mesh axis index).

    The ``n_sampled * ocs_global`` global class slots are enumerated
    FLAT (class-major: slot ``g`` belongs to class ``g // ocs_global``)
    and striped over devices: device ``d`` samples the static
    ``slots = ceil(filled / n_dev)`` slot grid and converts its
    past-the-end slots (``d*slots + j >= filled``) into uniform window
    starts.  Summed over the mesh, each repeat class contributes exactly
    ``ocs_global`` starts and the remainder is uniform — the same
    per-batch class distribution as the single-device sampler (which a
    plain ``ocs_global // n_dev`` per-device quota silently undercounts
    by up to ``n_dev - 1`` per class; VERDICT r4 item 8) — and the grid
    always fits: ``slots <= ceil(batch/n_dev) = local_batch`` whenever
    the single-device config is valid (``filled <= batch``), including
    saturated quotas where a per-class ceil grid would not.  Per-device
    class MIX varies across devices (striping), which is irrelevant
    after the ``pmean`` gradient reduction; the PRNG stream differs from
    single-device (per-device ``fold_in``), as documented in PARITY.md.
    """
    key_cls, key_fill, key_uni, key_perm = jax.random.split(key, 4)
    filled = n_sampled * ocs_global
    slots = -(-filled // n_dev) if filled else 0  # static
    if slots > local_batch:
        # Only reachable when filled > batch, which BatchSampler rejects.
        raise ValueError(
            f"per-device batch {local_batch} cannot hold "
            f"ceil({filled}/{n_dev}) class-balanced slots")
    parts = []
    if slots:
        g = dev_idx * slots + jnp.arange(slots, dtype=jnp.int32)
        keep = g < filled
        cls = jnp.clip(g // ocs_global, 0, n_sampled - 1)
        picks = jax.random.randint(key_cls, (slots,), 0, 1 << 30)
        idx = picks % jnp.take(lengths, cls)
        cls_starts = candidates[cls, idx]
        fill = jax.random.randint(key_fill, (slots,), 0,
                                  seq_len - vecsize)
        parts.append(jnp.where(keep, cls_starts, fill))
    n_uniform = local_batch - slots
    if n_uniform:
        parts.append(
            jax.random.randint(key_uni, (n_uniform,), 0, seq_len - vecsize))
    starts = jnp.concatenate(parts).astype(jnp.int32)
    return jax.random.permutation(key_perm, starts)


@partial(jax.jit, static_argnames=("vecsize", "dtype"))
def _gather(fwd, lbl, starts, vecsize: int, dtype):
    def cut(buf, start):
        return jax.lax.dynamic_slice(buf, (start, 0),
                                     (vecsize, buf.shape[1]))

    x = jax.vmap(lambda s: cut(fwd, s))(starts).astype(dtype)
    y = jax.vmap(lambda s: cut(lbl, s))(starts).astype(dtype)
    return x, y
