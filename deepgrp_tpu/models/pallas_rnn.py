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
