"""Sharded, genome-scale window-stream inference over a device mesh.

Design (SURVEY §7 step 6, BASELINE north star): the chromosome's window
chunks are split into contiguous per-device ranges.  Each device holds ONLY
its own range of block-rows plus a ``k = ceil(vecsize/step)``-block halo
(the rows its last windows read past its range) — nothing is replicated
except the model parameters.  Every device runs the same single-jit
chunk-scan as the single-chip engine (contiguous slab gathers, per-chunk
merge, spill carry, in-scan argmax/max scoring — predict/engine.py), driven
as host-pipelined fixed-size slices so the device->host fetch of slice ``i``
rides behind the compute of slices ``i+1..`` and HBM never holds more than
one slice of f32 output per device.

Boundary correctness: window overlap means each device's final merged spill
(``vecsize - step`` rows) lands in the NEXT device's output region head.
Those spills are tiny ``[overlap, C]`` arrays; they are returned per device
and max-combined into the neighbor's region head on the host during
assembly — bit-identical to the single-device merge because the overlap-max
is associative and windows are assigned disjointly.  For the scored path
(in-scan argmax) each device additionally returns the raw merged f32 rows
of its region head so the boundary rows can be re-scored after combining.

Memory budget at chromosome scale (chr1, ~250 Mbp, step 50, C=5, 8 devices):
per-device code block-rows ~31 MB HBM (one-hot would be 156 MB), per-slice
scored output ~0.5 MB, boundary arrays ~6 KB — the genome-length f32
probability matrix is never materialized on any device.
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
from deepgrp_tpu.predict.engine import (ScoredTrack, _slice_chunks,
                                        _unpack_scored, mss_score_transform,
                                        scan_chunk_range, window_starts)


@partial(jax.jit,
         static_argnames=("model", "step", "batch", "n_chunks",
                          "chunks_per_dev", "mesh", "compute_dtype", "score",
                          "with_head", "fused"))
def _sharded_slice(params, local_blocks, n_windows, chunk0, spills,
                   model: DeepGRPModel, step: int, batch: int, n_chunks: int,
                   chunks_per_dev: int, mesh: Mesh, compute_dtype,
                   score: bool, with_head: bool, fused: bool = False):
    """One pipeline slice on every device at once.

    ``local_blocks [n_dev, local_blocks_per_dev(, step...)]`` is sharded on
    its leading axis (each device sees only its shard); ``spills
    [n_dev, overlap, C]`` carries each device's merge spill between slices;
    ``chunk0`` is the device-local chunk offset of this slice (a traced
    scalar, so one compiled program covers all slices of a length bucket).
    """

    def device_fn(params, blocks, spill):
        dev = jax.lax.axis_index(DATA_AXIS)
        # Device-local window indexing: global window w lives on device
        # w // (chunks_per_dev*batch); masking needs the local remainder.
        n_win_local = n_windows - dev * (chunks_per_dev * batch)
        out = scan_chunk_range(params, blocks[0], n_win_local, chunk0,
                               spill[0], model, step, batch, n_chunks,
                               compute_dtype, score=score,
                               with_head=with_head, fused=fused)
        if score:
            # Pack (maxp, classes int8) into one uint8 buffer per
            # device (same bit transport as the single-device engine's
            # _scan_slice, incl. the lossless 2-byte bf16 maxp fast-mode
            # transport): one fetch per slice instead of two.
            classes, maxp, *rest = out
            if compute_dtype == jnp.bfloat16:
                maxp_bytes = jax.lax.bitcast_convert_type(
                    maxp.astype(jnp.bfloat16), jnp.uint8).reshape(-1)
            else:
                maxp_bytes = jax.lax.bitcast_convert_type(
                    maxp, jnp.uint8).reshape(-1)
            packed = jnp.concatenate([
                maxp_bytes,
                jax.lax.bitcast_convert_type(classes, jnp.uint8)])
            out = (packed, *rest)
        return tuple(y[None] for y in out)

    n_out = 3 if (score and with_head) else 2
    shard = jax.shard_map(device_fn, mesh=mesh,
                          in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                          out_specs=(P(DATA_AXIS),) * n_out,
                          check_vma=False)
    return shard(params, local_blocks, spills)


def _fetch(x) -> np.ndarray:
    """Device->host fetch that works across processes.

    Single-process: plain ``np.asarray``.  Multi-process (multi-host pods
    or the two-process CPU simulation, examples/multihost_sim.py): a
    globally-sharded array is not fully addressable from one process, so
    the remote shards are all-gathered first — every process then holds
    the full value, mirroring the single-host contract.
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


@partial(jax.jit, static_argnames=("mesh", "score"))
def _boundary_merge(tails, heads, mesh: Mesh, score: bool):
    """On-mesh spill hand-off: each device ``ppermute``s its final merge
    spill to its RIGHT neighbor over ICI and max-combines the received
    spill into its own region-head rows — the cross-shard form of the
    reference's overlap-max operator (``maxcalc.c:10-24``) at shard
    boundaries.  Devices without a left neighbor (device 0) receive zeros,
    so their heads pass through unchanged.

    Args:
        tails: ``[n_dev, overlap, C]`` sharded — each device's final spill.
        heads: ``[n_dev, overlap, C]`` sharded — each device's raw merged
            region-head rows (the only rows not final at a boundary).

    Returns:
        ``(combined [n_dev, overlap, C],)`` or, with ``score=True``,
        ``(classes int8 [n_dev, overlap], maxp f32 [n_dev, overlap])`` —
        complete on-device; the host only places rows.
    """
    perm = [(d, d + 1) for d in range(mesh.shape[DATA_AXIS] - 1)]

    def fn(tail, head):
        recv = jax.lax.ppermute(tail, DATA_AXIS, perm)
        combined = jnp.maximum(head[0], recv[0])
        if score:
            return (combined.argmax(-1).astype(jnp.int8)[None],
                    combined.max(-1)[None])
        return (combined[None],)

    return jax.shard_map(fn, mesh=mesh,
                         in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                         out_specs=(P(DATA_AXIS),) * (2 if score else 1),
                         check_vma=False)(tails, heads)


@partial(jax.jit, static_argnames=("mesh", "n_blocks", "step"))
def _expand_code_shards(codes, mesh: Mesh, n_blocks: int, step: int):
    """Reshape per-device code rows ``[n_dev, rows]`` to block-rows
    ``[n_dev, n_blocks, step]`` without leaving the devices."""
    shard = jax.shard_map(lambda c: c.reshape(1, n_blocks, step), mesh=mesh,
                          in_specs=P(DATA_AXIS), out_specs=P(DATA_AXIS),
                          check_vma=False)
    return shard(codes)


@partial(jax.jit,
         static_argnames=("rows", "n_dev", "mesh", "maxp_itemsize"))
def _assemble_scored_sharded(packed_slices, heads, tails, rows: int,
                             n_dev: int, mesh: Mesh,
                             maxp_itemsize: int = 4):
    """Device-side assembly of the full ``(classes, maxp)`` track from the
    sharded packed slices, INCLUDING the shard-boundary correction (each
    region head max-combined with the left neighbor's final spill — the
    same math as ``_boundary_merge``, here as plain array ops since the
    whole track is being assembled anyway) and the global tail (the last
    device's spill).  Bit-identical to the single-device
    ``_assemble_scored_slices`` track over the same windows.
    """
    cls_parts = []
    maxp_parts = []
    for p in packed_slices:
        if maxp_itemsize == 2:
            maxp_parts.append(jax.lax.bitcast_convert_type(
                p[:, :2 * rows].reshape(n_dev, rows, 2),
                jnp.bfloat16).astype(jnp.float32))
        else:
            maxp_parts.append(jax.lax.bitcast_convert_type(
                p[:, :4 * rows].reshape(n_dev, rows, 4), jnp.float32))
        cls_parts.append(jax.lax.bitcast_convert_type(
            p[:, maxp_itemsize * rows:], jnp.int8))
    classes = jnp.concatenate(cls_parts, axis=1).reshape(-1)
    maxp = jnp.concatenate(maxp_parts, axis=1).reshape(-1)
    region_rows = classes.shape[0] // n_dev
    overlap = tails.shape[1]
    if overlap and heads is not None and n_dev > 1:
        combined = jnp.maximum(heads[1:], tails[:-1])
        cls_b = combined.argmax(-1).astype(jnp.int8).reshape(-1)
        maxp_b = combined.max(-1).reshape(-1)
        if maxp_itemsize == 2:
            maxp_b = maxp_b.astype(jnp.bfloat16).astype(jnp.float32)
        # Region-head rows of devices 1..n-1 are the only in-scan values
        # not final at a shard boundary; overwrite them with the combined
        # scores via one scatter over the stacked row indices.
        idx = (jnp.arange(1, n_dev)[:, None] * region_rows +
               jnp.arange(overlap)[None, :]).reshape(-1)
        classes = classes.at[idx].set(cls_b)
        maxp = maxp.at[idx].set(maxp_b)
    if overlap:
        tail = tails[-1]
        tail_max = tail.max(-1)
        if maxp_itemsize == 2:
            tail_max = tail_max.astype(jnp.bfloat16).astype(jnp.float32)
        classes = jnp.concatenate([classes,
                                   tail.argmax(-1).astype(jnp.int8)])
        maxp = jnp.concatenate([maxp, tail_max])
    # Replicate the assembled track (an all-gather over ICI): the
    # downstream MSS is a sequential while-loop — running it over a
    # SHARDED array would drag a collective into every iteration (on the
    # CPU test mesh that live-locks outright); replicated inputs make
    # every device run the identical sequential program collective-free.
    replicated = NamedSharding(mesh, P())
    return (jax.lax.with_sharding_constraint(classes, replicated),
            jax.lax.with_sharding_constraint(maxp, replicated))


class ShardedPredictionEngine:
    """Data-parallel windowed predictor over a device mesh.

    Scales the reference's arbitrary-length chromosome streaming
    (prediction.py:89-111) across chips: accepts one-hot ``[5, L]`` or
    compact codes ``[L]`` (codes preferred at genome scale), returns
    results bit-identical to the single-device ``PredictionEngine``.
    """

    def __init__(self, model: DeepGRPModel, mesh: Mesh,
                 batch_size: int = 256, step_size: int = 50,
                 compute_dtype=jnp.float32, rnn_kernel: str = "auto",
                 collective: bool = True):
        from deepgrp_tpu.predict.engine import resolve_rnn_kernel

        self.model = model
        self.mesh = mesh
        self.step_size = int(step_size)
        k = -(-model.config.vecsize // self.step_size)
        self.batch_size = max(int(batch_size), k)
        self.compute_dtype = compute_dtype
        # bf16 fast mode ships maxp as 2 lossless bytes (see _scan_slice).
        self._maxp_itemsize = 2 if compute_dtype == jnp.bfloat16 else 4
        self.n_devices = mesh.shape[DATA_AXIS]
        self._k = k
        self._overlap = max(model.config.vecsize - self.step_size, 0)
        self.fused = resolve_rnn_kernel(rnn_kernel, model, compute_dtype)
        # On-mesh ppermute spill hand-off (default); False falls back to
        # host-side stitching of the fetched tails (bit-identical).
        self.collective = collective

    # -- planning ----------------------------------------------------------

    def _plan(self, seq_len: int) -> Tuple[int, int, int]:
        """(n_windows, chunks_per_dev, slice_chunks).

        ``chunks_per_dev`` is the per-device chunk range: exact when it fits
        in one slice (short sequences run no masked padding chunks), else
        padded to the ``SLICE_CHUNKS`` grid so one compiled slice program
        covers every long sequence.
        """
        starts = window_starts(seq_len, self.model.config.vecsize,
                               self.step_size)
        if starts.size == 0:
            return 0, 0, 0
        chunks = -(-starts.size // self.batch_size)
        per_dev = -(-chunks // self.n_devices)
        sc = _slice_chunks()
        if per_dev > sc:
            per_dev = -(-per_dev // sc) * sc
        return starts.size, per_dev, min(per_dev, sc)

    def _prepare_shards(self, seq_repr: np.ndarray, chunks_per_dev: int):
        """Split the sequence into per-device block-row shards with halos.

        Device ``d`` owns chunks ``[d*cpd, (d+1)*cpd)`` = block-rows
        ``[d*R, (d+1)*R + k)`` where ``R = cpd*batch`` (k-block halo).
        Returns a device array sharded on the leading device axis.
        """
        step = self.step_size
        region_blocks = chunks_per_dev * self.batch_size
        local_blocks = region_blocks + self._k
        total_rows = (self.n_devices * region_blocks + self._k) * step
        if seq_repr.ndim == 1:
            codes = seq_repr
            if total_rows > codes.shape[0]:
                codes = np.pad(codes, (0, total_rows - codes.shape[0]),
                               constant_values=5)  # one_hot(5) == all-zero
            local_rows = local_blocks * step
            shards = np.stack([
                codes[d * region_blocks * step:
                      d * region_blocks * step + local_rows]
                for d in range(self.n_devices)
            ])
            sharded = jax.device_put(
                shards, NamedSharding(self.mesh, P(DATA_AXIS)))
            return _expand_code_shards(sharded, self.mesh, local_blocks,
                                       step)
        seq = seq_repr.T  # [L, 5] int8
        if total_rows > seq.shape[0]:
            seq = np.pad(seq, ((0, total_rows - seq.shape[0]), (0, 0)))
        shards = np.stack([
            np.ascontiguousarray(
                seq[d * region_blocks * step:
                    d * region_blocks * step + local_blocks * step]
            ).reshape(local_blocks, step, seq.shape[1])
            for d in range(self.n_devices)
        ])
        return jax.device_put(shards,
                              NamedSharding(self.mesh, P(DATA_AXIS)))

    # -- drivers -----------------------------------------------------------

    def _run_sliced(self, params, seq_repr: np.ndarray, n_windows: int,
                    chunks_per_dev: int, slice_chunks: int, score: bool):
        """Dispatch all slices asynchronously; yield host results in order.

        Returns ``(slice_outputs, heads, tails, rows_per_slice)`` where
        ``slice_outputs`` is a list over slices of per-device outputs,
        ``heads`` (scored only) are each device's raw region-head f32 rows,
        and ``tails`` each device's final spill ``[n_dev, overlap, C]``.
        """
        local = self._prepare_shards(seq_repr, chunks_per_dev)
        params_dev = jax.device_put(params, NamedSharding(self.mesh, P()))
        n_classes = self.model.config.n_classes
        spills = jax.device_put(
            jnp.zeros((self.n_devices, self._overlap, n_classes),
                      jnp.float32), NamedSharding(self.mesh, P(DATA_AXIS)))
        n_win = jnp.int32(n_windows)
        outs = []
        heads = None
        for i, chunk0 in enumerate(range(0, chunks_per_dev, slice_chunks)):
            with_head = score and i == 0 and self._overlap > 0
            res = _sharded_slice(params_dev, local, n_win, jnp.int32(chunk0),
                                 spills, self.model, self.step_size,
                                 self.batch_size, slice_chunks,
                                 chunks_per_dev, self.mesh,
                                 self.compute_dtype, score, with_head,
                                 self.fused)
            if with_head:
                *ys, head_stack, spills = res
                heads = head_stack[:, 0]  # chunk 0 of slice 0 per device
            else:
                *ys, spills = res
            if (not score and i == 0 and self._overlap > 0
                    and self.collective):
                # Unscored path: region-head rows come straight off the
                # slice-0 blocks (still on device, for _boundary_merge).
                heads = ys[0][:, :self._overlap]
            outs.append(ys)
        rows_per_slice = slice_chunks * self.batch_size * self.step_size
        return outs, heads, spills, rows_per_slice

    def predict(self, params, seq_repr: np.ndarray,
                out_len: Optional[int] = None) -> np.ndarray:
        """Merged probabilities ``float32 [out_len, C]`` for a ``[5, L]``
        one-hot or compact ``[L]`` codes sequence.

        NOTE: materializes the genome-length f32 matrix on the HOST (that is
        its contract, like the reference's ``predict``); for chromosome
        scale use :meth:`predict_scored`, which transfers and stores only
        per-position ``(int8, f32)``.
        """
        out_len = seq_repr.shape[-1] if out_len is None else int(out_len)
        n_classes = self.model.config.n_classes
        n_windows, chunks_per_dev, slice_chunks = self._plan(
            seq_repr.shape[-1])
        if n_windows == 0:
            return np.zeros((out_len, n_classes), dtype=np.float32)
        slices, heads, tails, rows_per_slice = self._run_sliced(
            params, seq_repr, n_windows, chunks_per_dev, slice_chunks,
            score=False)
        region_rows = chunks_per_dev * self.batch_size * self.step_size
        corrected = None
        if self.collective and self._overlap > 0 and heads is not None:
            # On-mesh boundary fix-up: the spill hand-off rides ICI
            # (ppermute) and the corrected head rows arrive complete.
            (combined,) = _boundary_merge(tails, heads, self.mesh,
                                          score=False)
            corrected = _fetch(combined)
        out = np.zeros((out_len, n_classes), dtype=np.float32)
        for i in range(len(slices)):
            (blocks,) = slices[i]
            slices[i] = None  # free device buffers as we go
            blocks = _fetch(blocks)  # [n_dev, rows_per_slice, C]
            for d in range(self.n_devices):
                lo = d * region_rows + i * rows_per_slice
                take = min(out_len - lo, rows_per_slice)
                if take > 0:
                    out[lo:lo + take] = blocks[d, :take]
        if corrected is not None:
            for d in range(1, self.n_devices):
                lo = d * region_rows
                hi = min(lo + self._overlap, out_len)
                if hi > lo:
                    out[lo:hi] = corrected[d, :hi - lo]
            # The last device's spill has no right neighbor: it is the
            # global tail past the final region.
            tail_last = _fetch(tails)[-1]
            lo = self.n_devices * region_rows
            hi = min(lo + self._overlap, out_len)
            if hi > lo:
                np.maximum(out[lo:hi], tail_last[:hi - lo], out=out[lo:hi])
            return out
        # Host fallback: device d's spill lands in region d+1's head (for
        # the last device: past the end of its region — the global tail).
        tails = _fetch(tails)
        for d in range(self.n_devices):
            lo = (d + 1) * region_rows
            hi = min(lo + self._overlap, out_len)
            if hi > lo:
                np.maximum(out[lo:hi], tails[d, :hi - lo], out=out[lo:hi])
        return out

    def scored_tracks(self, params,
                      seq_repr: np.ndarray) -> Optional[ScoredTrack]:
        """Dispatch the sharded sliced scored scan; return the route
        handle (same contract as ``PredictionEngine.scored_tracks``)."""
        out_len = seq_repr.shape[-1]
        n_windows, chunks_per_dev, slice_chunks = self._plan(out_len)
        if n_windows == 0:
            return None
        slices, heads, tails, rows_per_slice = self._run_sliced(
            params, seq_repr, n_windows, chunks_per_dev, slice_chunks,
            score=True)
        state = (slices, heads, tails, rows_per_slice, chunks_per_dev)
        return ScoredTrack(self, state, out_len)

    def device_route_ok(self) -> bool:
        """The on-device assembly/MSS route needs every shard addressable
        from this process (multi-host runs keep the host MSS route)."""
        return jax.process_count() == 1

    def _assemble_scored(self, state):
        slices, heads, tails, rows_per_slice, _ = state
        return _assemble_scored_sharded(tuple(s[0] for s in slices), heads,
                                        tails, rows_per_slice,
                                        self.n_devices, self.mesh,
                                        maxp_itemsize=self._maxp_itemsize)

    def predict_scored_device(self, params, seq_repr: np.ndarray):
        """Device-resident scored track ``(classes, maxp, rows)`` — the
        sharded counterpart of ``PredictionEngine.predict_scored_device``
        (feeds ``predict.postprocess.apply_mss_on_device``)."""
        track = self.scored_tracks(params, seq_repr)
        if track is None:
            return None, None, 0
        classes, maxp = track.device()
        return classes, maxp, min(seq_repr.shape[-1], classes.shape[0])

    def _mss_scores_from_state(self, state, out_len: int
                               ) -> Tuple[np.ndarray, np.ndarray]:
        classes, scores = self._fetch_scored_state(state, out_len,
                                                   transform=True)
        return classes, scores

    def predict_scored(self, params, seq_repr: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Per-position ``(classes int8 [L], max_prob float32 [L])``.

        The genome-scale path: argmax/max are taken inside each device's
        scan, so only 5 bytes/position ever cross to the host and no
        genome-length f32 array exists anywhere.
        """
        out_len = seq_repr.shape[-1]
        track = self.scored_tracks(params, seq_repr)
        if track is None:
            return np.zeros(out_len, np.int8), np.zeros(out_len, np.float32)
        return self._fetch_scored_state(track._state, out_len,
                                        transform=False)

    def _fetch_scored_state(self, state, out_len: int, transform: bool
                            ) -> Tuple[np.ndarray, np.ndarray]:
        """Fetch + place the packed scored slices of a dispatched scan.

        ``transform=False`` returns ``(classes, max_prob)``;
        ``transform=True`` applies the reference MSS score transform
        inside the fetch workers (bit-identical to transforming the
        ``transform=False`` outputs whole-array — the transform is
        elementwise float32) and returns ``(classes, scores)`` with
        uncovered rows at the zero-probability fill.
        """
        slices, heads, tails, rows_per_slice, chunks_per_dev = state
        out_classes = np.zeros(out_len, np.int8)
        if transform:
            out_vals = np.empty(out_len, np.float32)
            out_vals[:] = mss_score_transform(np.zeros(1, np.int8),
                                              np.zeros(1, np.float32))[0]
        else:
            out_vals = np.zeros(out_len, np.float32)

        def place(lo: int, cls: np.ndarray, maxp: np.ndarray,
                  normalize: bool = False) -> None:
            hi = min(lo + cls.shape[0], out_len)
            if hi <= lo:
                return
            mp = maxp[:hi - lo]
            if normalize and self._maxp_itemsize == 2:
                # Boundary/tail rows arrive as raw f32; normalize to the
                # bf16 fast mode's nominal precision like the packed rows.
                from deepgrp_tpu.predict.engine import _round_bf16_host

                mp = _round_bf16_host(mp)
            out_classes[lo:hi] = cls[:hi - lo]
            if transform:
                out_vals[lo:hi] = mss_score_transform(cls[:hi - lo], mp)
            else:
                out_vals[lo:hi] = mp

        region_rows = chunks_per_dev * self.batch_size * self.step_size
        boundary = None
        if self.collective and self._overlap > 0 and heads is not None:
            # On-mesh boundary fix-up: spill hand-off via ppermute, head
            # rows re-scored on-device (argmax/max of the combined rows).
            cls_b, maxp_b = _boundary_merge(tails, heads, self.mesh,
                                            score=True)
            boundary = (_fetch(cls_b), _fetch(maxp_b))
        if jax.process_count() == 1:
            # Concurrent packed fetches (round-trip overheads overlap);
            # the transform (when requested) runs inside the workers so
            # its cost rides behind the other slices' transfers.
            from concurrent.futures import ThreadPoolExecutor

            def fetch(i):
                packed_s = np.asarray(slices[i][0])
                for d in range(self.n_devices):
                    classes_s, maxp_s = _unpack_scored(
                        packed_s[d], rows_per_slice, self._maxp_itemsize)
                    place(d * region_rows + i * rows_per_slice,
                          classes_s, maxp_s)

            with ThreadPoolExecutor(min(len(slices), 8)) as ex:
                list(ex.map(fetch, range(len(slices))))
        else:
            # Multi-process stays sequential: process_allgather is a
            # collective and must execute in the same order everywhere.
            for i in range(len(slices)):
                packed_s = _fetch(slices[i][0])
                for d in range(self.n_devices):
                    classes_s, maxp_s = _unpack_scored(
                        packed_s[d], rows_per_slice, self._maxp_itemsize)
                    place(d * region_rows + i * rows_per_slice,
                          classes_s, maxp_s)
        del slices  # free the device buffers
        if boundary is not None:
            cls_b, maxp_b = boundary
            for d in range(1, self.n_devices):
                place(d * region_rows, cls_b[d, :self._overlap],
                      maxp_b[d, :self._overlap], normalize=True)
            # Global tail: the last device's spill, scored on host.
            tail_last = _fetch(tails)[-1]
            place(self.n_devices * region_rows,
                  tail_last.argmax(axis=1).astype(np.int8),
                  tail_last.max(axis=1).astype(np.float32), normalize=True)
            return out_classes, out_vals
        # Host fallback: re-score region heads after combining the left
        # neighbor's spill; the last device's spill scores the global tail.
        tails = _fetch(tails)
        heads = None if heads is None else _fetch(heads)
        for d in range(self.n_devices):
            lo = (d + 1) * region_rows
            hi = min(lo + self._overlap, out_len)
            if hi <= lo:
                continue
            combined = tails[d, :hi - lo]
            if d + 1 < self.n_devices and heads is not None:
                combined = np.maximum(combined, heads[d + 1, :hi - lo])
            place(lo, combined.argmax(axis=1).astype(np.int8),
                  combined.max(axis=1).astype(np.float32), normalize=True)
        return out_classes, out_vals
