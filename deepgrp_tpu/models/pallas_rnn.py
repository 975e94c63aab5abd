"""Fused Pallas TPU kernel for the GRU recurrence (inference path).

Why a kernel: under plain XLA the scan body is a tiny per-step dispatch —
``[B, u] @ [u, 3u]`` — whose overheads dominate (the recurrence is the only
sequential part of the model).  This kernel keeps the hidden state in a
VMEM scratch across a sequential time grid, computes the input projections
in-kernel from the 5-channel one-hot input (a single ``[Bt*8, 5] @
[5, 3u]`` dot per tile — avoiding a ``[B, T, 3u]`` HBM intermediate
entirely), and streams only ``x`` in and the hidden sequence out.  Eight
timesteps are processed per grid step (the minimal sublane-aligned time
block), so Pallas double-buffers the next 8-step x/seq blocks while the
current block computes.

Numerics are identical to :func:`deepgrp_tpu.models.rnn.gru_apply`
(Keras ``reset_after=True`` gate math); tests assert equality in
interpreter mode.  Measured on v5e at the flagship config (units=60,
B=2048), XLA's compilation of the ``lax.scan`` path is ~1.5x faster than
this kernel (7.9 vs 12.1 ms/batch) — at these tiny recurrent dims XLA's
scheduling wins, so the engine defaults to the scan; the kernel is kept
as the ``rnn_apply`` override for larger-unit configs where the fused
VMEM-resident recurrence pays off.

Layout notes (/opt/skills/guides/pallas_guide.md): block shapes must have
their last two dims divisible by (8, 128) or equal to the array dims —
hence the (block_b, 8, channels) x-blocks with T padded to a multiple
of 8.  ``preferred_element_type=float32`` keeps MXU accumulation in f32
even for bf16 IO; the carried hidden state is always f32.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TIME_BLOCK = 8


def _gru_kernel(x_ref, w_ref, bin_ref, u_ref, brec_ref, seq_ref, last_ref,
                h_ref, *, units: int, time_block: int, last_tile: int,
                last_sub: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    block_b = x_ref.shape[0]
    channels = x_ref.shape[2]
    # One MXU dot covers the input projections of all sub-steps.
    xp_all = jnp.dot(x_ref[:].reshape(block_b * time_block, channels),
                     w_ref[:], preferred_element_type=jnp.float32)
    xp_all = xp_all.reshape(block_b, time_block, 3 * units) + bin_ref[0]

    h = h_ref[:]
    for s in range(time_block):
        xp = xp_all[:, s, :]
        rp = jnp.dot(h, u_ref[:],
                     preferred_element_type=jnp.float32) + brec_ref[0]
        z = jax.nn.sigmoid(xp[:, :units] + rp[:, :units])
        r = jax.nn.sigmoid(xp[:, units:2 * units] + rp[:, units:2 * units])
        hh = jnp.tanh(xp[:, 2 * units:] + r * rp[:, 2 * units:])
        h = z * h + (1.0 - z) * hh
        seq_ref[:, s, :] = h.astype(seq_ref.dtype)
        if s == last_sub:
            @pl.when(t == last_tile)
            def _(h=h):
                last_ref[:] = h.astype(last_ref.dtype)
    h_ref[:] = h


@functools.partial(jax.jit,
                   static_argnames=("block_b", "time_block", "interpret"))
def _pallas_gru(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                recurrent: jax.Array, block_b: int, time_block: int,
                interpret: bool) -> Tuple[jax.Array, jax.Array]:
    batch, t_steps, channels = x.shape
    units = recurrent.shape[0]
    pad_b = (-batch) % block_b
    pad_t = (-t_steps) % time_block
    if pad_b or pad_t:
        x = jnp.pad(x, ((0, pad_b), (0, pad_t), (0, 0)))
    padded_b = batch + pad_b
    padded_t = t_steps + pad_t

    io_dtype = x.dtype
    grid = (padded_b // block_b, padded_t // time_block)
    seq, last = pl.pallas_call(
        functools.partial(_gru_kernel, units=units, time_block=time_block,
                          last_tile=(t_steps - 1) // time_block,
                          last_sub=(t_steps - 1) % time_block),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, time_block, channels),
                         lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((channels, 3 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((units, 3 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, time_block, units),
                         lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, units), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded_b, padded_t, units), io_dtype),
            jax.ShapeDtypeStruct((padded_b, units), io_dtype),
        ],
        scratch_shapes=[pltpu.VMEM((block_b, units), jnp.float32)],
        interpret=interpret,
    )(x, kernel.astype(io_dtype), bias[:1].reshape(1, 3 * units),
      recurrent.astype(io_dtype), bias[1:].reshape(1, 3 * units))
    return seq[:batch, :t_steps], last[:batch]


def pallas_gru_apply(params, x: jax.Array, *,
                     dropout_rate=0.0,
                     dropout_key: Optional[jax.Array] = None,
                     block_b: int = 512,
                     time_block: int = _TIME_BLOCK,
                     interpret: bool = False,
                     unroll: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for :func:`rnn.gru_apply` (inference only)."""
    del unroll
    if dropout_key is not None and not isinstance(dropout_rate, (int, float)):
        raise ValueError("pallas GRU kernel is inference-only (no dropout)")
    if dropout_key is not None and dropout_rate > 0.0:
        raise ValueError("pallas GRU kernel is inference-only (no dropout)")
    block_b = min(block_b, max(x.shape[0], 8))
    return _pallas_gru(x, params["kernel"], params["bias"],
                       params["recurrent"], block_b, time_block, interpret)


def make_interpret_apply(block_b: int = 128):
    """Interpreter-mode variant (CPU tests)."""

    def apply(params, x, **kwargs):
        kwargs.pop("interpret", None)
        return pallas_gru_apply(params, x, interpret=True, block_b=block_b,
                                **kwargs)

    return apply


# ---------------------------------------------------------------------------
# v2: the production inference kernel.  Lessons from the v1 sweep
# (benchmarks/rnn_kernel_bench.json): (a) a one-hot ``[bb, tb, 5]`` input
# block lane-pads 5 -> 128 (25x VMEM waste), capping block_b at 256 and
# serializing the batch into dots 8x smaller than XLA's scan — v1 loses
# everywhere; (b) the per-step latency win must come from keeping the FULL
# doubled-batch hidden state in VMEM and cutting HBM round-trips.  v2
# therefore takes compact int32 base codes (no lane padding), computes the
# input projection in-kernel as an EXACT 5-way row select of the kernel
# weights (a one-hot matmul is a row gather — no matmul rounding, no big
# temp), runs the forward and reverse-complement branches in ONE combined
# ``[2*bb, u]`` hidden state (XLA-scan-sized MXU dots), and fuses the
# branch averaging so only ``avg [B, T, u]`` ever reaches HBM — half the
# sequence bytes XLA writes, and none of the ``[2B, T, 3u]`` projection
# traffic the scan path spools through HBM.

# DNA complement for code values 0..5 (A<->T, C<->G, N->N, pad->pad).
_COMPLEMENT_CODES = (3, 2, 1, 0, 4, 5)


_CODE_COLS = 128  # codes block lane width (the minimal lane tile)


def _gru_avg_kernel(codes_ref, w_ref, bin_ref, u_ref, brec_ref,
                    avg_ref, hidden_ref, h_ref, acc_ref, *, units: int,
                    time_block: int, channels: int, last_tile: int,
                    last_sub: int, precision):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    # codes are [2*block_b, _CODE_COLS]: rows pair each batch block's
    # forward rows with their reverse-complement rows (host pre-pairing);
    # one codes block covers _CODE_COLS/time_block output tiles, so the
    # column offset of this tile's steps is derived from t.
    block_b = codes_ref.shape[0] // 2
    tiles_per_block = _CODE_COLS // time_block
    col0 = (t % tiles_per_block) * time_block
    codes_all = codes_ref[:]  # [2*bb, _CODE_COLS], one VMEM load per tile
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _CODE_COLS), 1)
    h = h_ref[:]
    for s in range(time_block):
        # [2*bb, 1] column extraction via lane-masked reduction (dynamic
        # single-lane slices are not Mosaic-addressable).
        code = jnp.sum(jnp.where(lane == col0 + s, codes_all, 0), axis=1,
                       keepdims=True)
        # Input projection as an exact row select: one-hot @ W == W[code]
        # (pad code 5 selects nothing -> bias only, like a zero row).
        xp = jnp.broadcast_to(bin_ref[0], (2 * block_b, 3 * units))
        for c in range(channels):
            xp = xp + jnp.where(code == c, w_ref[c][None, :], 0.0)
        rp = jnp.dot(h, u_ref[:], preferred_element_type=jnp.float32,
                     precision=precision) + brec_ref[0]
        z = jax.nn.sigmoid(xp[:, :units] + rp[:, :units])
        r = jax.nn.sigmoid(xp[:, units:2 * units] + rp[:, units:2 * units])
        hh = jnp.tanh(xp[:, 2 * units:] + r * rp[:, 2 * units:])
        h = z * h + (1.0 - z) * hh
        avg = (h[:block_b] + h[block_b:]) * 0.5
        # Per-substep stores go to an f32 scratch: Mosaic rejects the
        # [bb, u] -> [bb, 1, u] shape cast for bf16 stores (the round-2
        # BENCH failure), and a single whole-block cast-store below is
        # both legal and cheaper than time_block narrow stores.
        acc_ref[:, s, :] = avg
        if s == last_sub:
            @pl.when(t == last_tile)
            def _(avg_last=avg):
                hidden_ref[:] = avg_last.astype(hidden_ref.dtype)
    h_ref[:] = h
    avg_ref[:] = acc_ref[:].astype(avg_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "time_block",
                                             "out_dtype", "interpret"))
def _pallas_gru_avg(codes_fwd: jax.Array, codes_rev: jax.Array,
                    kernel: jax.Array, bias: jax.Array,
                    recurrent: jax.Array, block_b: int, time_block: int,
                    out_dtype, interpret: bool
                    ) -> Tuple[jax.Array, jax.Array]:
    batch, t_steps = codes_fwd.shape
    channels = kernel.shape[0]
    units = recurrent.shape[0]
    pad_b = (-batch) % block_b
    pad_t = (-t_steps) % time_block
    if pad_b or pad_t:
        codes_fwd = jnp.pad(codes_fwd, ((0, pad_b), (0, pad_t)),
                            constant_values=channels)  # pad -> zero row
        codes_rev = jnp.pad(codes_rev, ((0, pad_b), (0, pad_t)),
                            constant_values=channels)
    padded_b = batch + pad_b
    padded_t = t_steps + pad_t
    n_bblocks = padded_b // block_b
    # Codes ride in [2B, T128] layout: rows pre-pair each batch block's
    # forward rows with its reverse-complement rows (the kernel's combined
    # doubled batch is one contiguous row range), and the time dim pads to
    # the 128-lane tile so a (2*block_b, 128) block satisfies the (8, 128)
    # rule — a one-hot [bb, tb, 5] input block would lane-pad 5 -> 128.
    pad_cols = (-padded_t) % _CODE_COLS
    cf = jnp.pad(codes_fwd, ((0, 0), (0, pad_cols)),
                 constant_values=channels).reshape(n_bblocks, block_b, -1)
    cr = jnp.pad(codes_rev, ((0, 0), (0, pad_cols)),
                 constant_values=channels).reshape(n_bblocks, block_b, -1)
    codes_paired = jnp.concatenate([cf, cr], axis=1).reshape(
        2 * padded_b, padded_t + pad_cols)
    tiles_per_block = _CODE_COLS // time_block

    # float32 output -> full-precision recurrent dot (parity-grade
    # numerics); bfloat16 mode takes the fast MXU path.
    precision = (jax.lax.Precision.HIGHEST if out_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    grid = (n_bblocks, padded_t // time_block)
    avg, hidden = pl.pallas_call(
        functools.partial(_gru_avg_kernel, units=units,
                          time_block=time_block, channels=channels,
                          last_tile=(t_steps - 1) // time_block,
                          last_sub=(t_steps - 1) % time_block,
                          precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * block_b, _CODE_COLS),
                         lambda i, t, n=tiles_per_block: (i, t // n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((channels, 3 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((units, 3 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, time_block, units),
                         lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, units), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded_b, padded_t, units), out_dtype),
            jax.ShapeDtypeStruct((padded_b, units), out_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * block_b, units), jnp.float32),
            pltpu.VMEM((block_b, time_block, units), jnp.float32),
        ],
        interpret=interpret,
    )(codes_paired.astype(jnp.int32), kernel.astype(jnp.float32),
      bias[:1].reshape(1, 3 * units).astype(jnp.float32),
      recurrent.astype(jnp.float32),
      bias[1:].reshape(1, 3 * units).astype(jnp.float32))
    return avg[:batch, :t_steps], hidden[:batch]


def _lstm_avg_kernel(codes_ref, w_ref, b_ref, u_ref, avg_ref, hidden_ref,
                     h_ref, c_ref, acc_ref, *, units: int, time_block: int,
                     channels: int, last_tile: int, last_sub: int,
                     precision):
    """LSTM leg of the fused recurrence (same layout as _gru_avg_kernel).

    Keras gate order (i, f, c, o) with a single bias row
    (models/rnn.py lstm_apply); carry is (h, c), both [2*bb, u] f32
    VMEM scratch.  Everything else — code row-select input projection,
    fwd/revcomp row pairing, fused branch averaging — is identical to the
    GRU kernel.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    block_b = codes_ref.shape[0] // 2
    tiles_per_block = _CODE_COLS // time_block
    col0 = (t % tiles_per_block) * time_block
    codes_all = codes_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _CODE_COLS), 1)
    h = h_ref[:]
    c = c_ref[:]
    for s in range(time_block):
        code = jnp.sum(jnp.where(lane == col0 + s, codes_all, 0), axis=1,
                       keepdims=True)
        xp = jnp.broadcast_to(b_ref[0], (2 * block_b, 4 * units))
        for ch in range(channels):
            xp = xp + jnp.where(code == ch, w_ref[ch][None, :], 0.0)
        gates = xp + jnp.dot(h, u_ref[:],
                             preferred_element_type=jnp.float32,
                             precision=precision)
        i = jax.nn.sigmoid(gates[:, :units])
        f = jax.nn.sigmoid(gates[:, units:2 * units])
        g = jnp.tanh(gates[:, 2 * units:3 * units])
        o = jax.nn.sigmoid(gates[:, 3 * units:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        avg = (h[:block_b] + h[block_b:]) * 0.5
        acc_ref[:, s, :] = avg
        if s == last_sub:
            @pl.when(t == last_tile)
            def _(avg_last=avg):
                hidden_ref[:] = avg_last.astype(hidden_ref.dtype)
    h_ref[:] = h
    c_ref[:] = c
    avg_ref[:] = acc_ref[:].astype(avg_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "time_block",
                                             "out_dtype", "interpret"))
def _pallas_lstm_avg(codes_fwd: jax.Array, codes_rev: jax.Array,
                     kernel: jax.Array, bias: jax.Array,
                     recurrent: jax.Array, block_b: int, time_block: int,
                     out_dtype, interpret: bool
                     ) -> Tuple[jax.Array, jax.Array]:
    batch, t_steps = codes_fwd.shape
    channels = kernel.shape[0]
    units = recurrent.shape[0]
    pad_b = (-batch) % block_b
    pad_t = (-t_steps) % time_block
    if pad_b or pad_t:
        codes_fwd = jnp.pad(codes_fwd, ((0, pad_b), (0, pad_t)),
                            constant_values=channels)
        codes_rev = jnp.pad(codes_rev, ((0, pad_b), (0, pad_t)),
                            constant_values=channels)
    padded_b = batch + pad_b
    padded_t = t_steps + pad_t
    n_bblocks = padded_b // block_b
    pad_cols = (-padded_t) % _CODE_COLS
    cf = jnp.pad(codes_fwd, ((0, 0), (0, pad_cols)),
                 constant_values=channels).reshape(n_bblocks, block_b, -1)
    cr = jnp.pad(codes_rev, ((0, 0), (0, pad_cols)),
                 constant_values=channels).reshape(n_bblocks, block_b, -1)
    codes_paired = jnp.concatenate([cf, cr], axis=1).reshape(
        2 * padded_b, padded_t + pad_cols)
    tiles_per_block = _CODE_COLS // time_block

    precision = (jax.lax.Precision.HIGHEST if out_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    grid = (n_bblocks, padded_t // time_block)
    avg, hidden = pl.pallas_call(
        functools.partial(_lstm_avg_kernel, units=units,
                          time_block=time_block, channels=channels,
                          last_tile=(t_steps - 1) // time_block,
                          last_sub=(t_steps - 1) % time_block,
                          precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * block_b, _CODE_COLS),
                         lambda i, t, n=tiles_per_block: (i, t // n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((channels, 4 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((units, 4 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, time_block, units),
                         lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, units), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded_b, padded_t, units), out_dtype),
            jax.ShapeDtypeStruct((padded_b, units), out_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * block_b, units), jnp.float32),
            pltpu.VMEM((2 * block_b, units), jnp.float32),
            pltpu.VMEM((block_b, time_block, units), jnp.float32),
        ],
        interpret=interpret,
    )(codes_paired.astype(jnp.int32), kernel.astype(jnp.float32),
      bias.reshape(1, 4 * units).astype(jnp.float32),
      recurrent.astype(jnp.float32))
    return avg[:batch, :t_steps], hidden[:batch]


def pallas_lstm_avg(params, codes: jax.Array, *, block_b: int = 512,
                    time_block: Optional[int] = None,
                    out_dtype=jnp.float32,
                    interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Fused fwd+revcomp LSTM with branch averaging (inference).

    LSTM counterpart of :func:`pallas_gru_avg` — same contract (``codes
    [B, T]`` integer base codes in, ``(avg [B, T, u], hidden_avg [B, u])``
    out), matching the reference's LSTM cell option
    (/root/reference/deepgrp/model.py:218-230).  The reference's attention
    path is GRU-only (model.py:308), so the LSTM head consumes only
    ``avg``; ``hidden_avg`` is returned for interface symmetry.
    """
    if time_block is None:
        time_block = 16 if out_dtype == jnp.bfloat16 else _TIME_BLOCK
    if _CODE_COLS % time_block:
        raise ValueError(
            f"time_block must divide {_CODE_COLS} (codes lane tile); "
            f"got {time_block}")
    comp = jnp.asarray(_COMPLEMENT_CODES, dtype=codes.dtype)
    codes_rev = comp[codes[:, ::-1]]
    block_b = min(block_b, max(codes.shape[0], 8))
    interpret = interpret or jax.default_backend() != "tpu"
    return _pallas_lstm_avg(codes, codes_rev, params["kernel"],
                            params["bias"], params["recurrent"], block_b,
                            time_block, out_dtype, interpret)


# block_b=512 is both the measured winner (benchmarks/rnn_kernel_bench.json)
# and the largest block Mosaic compiles: 1024 (a [2048, .] combined batch)
# crashes the TPU compiler outright.  The best time_block is dtype-
# dependent (same sweep): 8 for float32 (2.23 ms at the flagship shape;
# tb=16 f32 fails to compile), 16 for bfloat16 (1.35 vs 5.90 ms at tb=8).
def pallas_gru_avg(params, codes: jax.Array, *, block_b: int = 512,
                   time_block: Optional[int] = None, out_dtype=jnp.float32,
                   interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Fused fwd+revcomp GRU with branch averaging (inference).

    Args:
        params: GRU params (Keras layout, see models/rnn.py).
        codes: ``[B, T]`` integer base codes (A=0..T=3, N=4, pad=5).

    Returns:
        ``(avg [B, T, u], hidden_avg [B, u])`` — the per-position average
        of the forward and reverse-complement branch outputs and the
        average of their final states, exactly the two tensors the
        DeepGRP head consumes (models/model.py forward_logits).
    """
    if time_block is None:
        import os

        # 16 is the measured winner in BOTH dtypes at the flagship shape
        # (r5 interleaved sweep: f32 137k vs 131k w/s @ 8, bf16 213k vs
        # 159k; 32 is worse in both) and keeps f32 bitwise BED parity on
        # real Mosaic (test_bed_bitwise_parity_fused @ tb=16).
        time_block = int(os.environ.get("DEEPGRP_GRU_TIME_BLOCK", 16))
    if _CODE_COLS % time_block:
        raise ValueError(
            f"time_block must divide {_CODE_COLS} (codes lane tile); "
            f"got {time_block}")
    comp = jnp.asarray(_COMPLEMENT_CODES, dtype=codes.dtype)
    codes_rev = comp[codes[:, ::-1]]
    block_b = min(block_b, max(codes.shape[0], 8))
    # Non-TPU backends run the kernel through the Pallas interpreter
    # (slow but exact — lets CPU tests exercise the fused engine path).
    interpret = interpret or jax.default_backend() != "tpu"
    return _pallas_gru_avg(codes, codes_rev, params["kernel"],
                           params["bias"], params["recurrent"], block_b,
                           time_block, out_dtype, interpret)
