"""Fused Pallas TPU kernels for the TRAINING recurrence (fwd + bwd),
both cells: GRU (:func:`pallas_gru_avg_train`) and LSTM
(:func:`pallas_lstm_avg_train`, measured 2.25x the scan step at the
flagship shape — benchmarks/train_kernel_bench.json "lstm").

Round-3 left training on the XLA ``lax.scan`` path; measurement on the
v5e (benchmarks/train_kernel_bench.json) shows the doubled-batch GRU
recurrence is essentially the WHOLE optimization step (forward+backward
of the recurrence alone times the same as the full step), so this module
gives the train step the same treatment the inference path got:

  * **Forward** (`_gru_train_fwd_kernel`): the fwd+revcomp branches run as
    ONE combined ``[2*bb, u]`` VMEM-resident hidden state over a
    sequential time grid (same row-pairing/code layout as the inference
    kernel, models/pallas_rnn.py).  The input projection is an exact
    row-select of the kernel weights scaled by the Keras per-gate input
    dropout mask (``xp_g = mask_g[b, code] * W_g[code] + b_g`` — Keras
    draws 3 masks over the doubled batch, shared across timesteps;
    models/rnn.py:_input_dropout_masks).  Outputs the branch-averaged
    sequence/final state the head consumes AND the raw paired hidden
    sequence ``h_seq`` (the only residual backward needs).
  * **Backward** (`_gru_train_bwd_kernel`): reverse time grid; per step it
    RECOMPUTES the gates from ``h_prev`` + the code row-select (cheaper
    than spilling ``[2B, T, 3u]`` gate tensors through HBM — the scan
    path's backward reloads exactly that) and accumulates ``dW/dU/db`` in
    revisited VMEM output blocks across the whole grid.  The hidden-state
    cotangent is the only carry.

Gate math (Keras ``reset_after=True``, model parity with
``/root/reference/deepgrp/model.py:218-230``):

    z = sigmoid(xz + rz)        rp = h_prev @ U + b_rec
    r = sigmoid(xr + rr)
    hh = tanh(xh + r * rh)
    h  = z * h_prev + (1-z) * hh

Backward per step, given the accumulated cotangent ``dh``:

    da_z = dh * (h_prev - hh) * z * (1-z)
    da_h = dh * (1-z) * (1 - hh^2)
    da_r = (da_h * rh) * r * (1-r)
    d_xp = [da_z, da_r, da_h]          d_rp = [da_z, da_r, da_h * r]
    dh_prev = dh * z + d_rp @ U^T
    dU += h_prev^T d_rp   db_rec += sum d_rp
    dW[c] += sum_{code==c} mask_c * d_xp   db_in += sum d_xp

Exposed as :func:`pallas_gru_avg_train`, a ``jax.custom_vjp`` drop-in for
the scan composition (grad-equality tests in tests/test_pallas_train.py).
No cotangent is produced for ``codes``/``masks`` (integer data / random
constants).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepgrp_tpu.models.pallas_rnn import _CODE_COLS, _COMPLEMENT_CODES

_TIME_BLOCK = 8


def _select_xp(code, w_ref, bias_row, mask, channels: int, units: int,
               block2: int, n_gates: int = 3):
    """Masked input projection: ``bias + mask_g[b, code] * W_g[code]``.

    ``code``: ``[2bb, 1]`` int32; ``mask``: ``[2bb, n_gates*channels]``
    f32 (per gate g and channel c at column ``g*channels + c``) or
    ``None`` for the deterministic path.  Returns ``[2bb, n_gates*u]``.
    """
    xp = jnp.broadcast_to(bias_row, (block2, n_gates * units))
    for c in range(channels):
        row = w_ref[c][None, :]  # [1, n_gates*u]
        if mask is not None:
            row = _gate_mask_scale(mask, c, channels, units, block2,
                                   n_gates) * row
        xp = xp + jnp.where(code == c, row, 0.0)
    return xp


def _gate_mask_scale(mask, c: int, channels: int, units: int, block2: int,
                     n_gates: int):
    """Per-gate dropout scale columns for channel ``c`` broadcast to
    ``[2bb, n_gates*u]`` — the ONE definition of the gate-major mask
    column layout, shared by the input projections and both backward
    kernels' dW accumulation."""
    return jnp.concatenate([
        jnp.broadcast_to(mask[:, g * channels + c: g * channels + c + 1],
                         (block2, units)) for g in range(n_gates)
    ], axis=1)


def _gru_train_fwd_kernel(codes_ref, mask_ref, w_ref, bin_ref, u_ref,
                          brec_ref, avg_ref, hidden_ref, hseq_ref, h_ref,
                          *, units: int, time_block: int, channels: int,
                          last_tile: int, last_sub: int, has_mask: bool):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    block2 = codes_ref.shape[0]
    block_b = block2 // 2
    tiles_per_block = _CODE_COLS // time_block
    col0 = (t % tiles_per_block) * time_block
    codes_all = codes_ref[:]
    mask = mask_ref[:] if has_mask else None
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _CODE_COLS), 1)
    h = h_ref[:]
    for s in range(time_block):
        code = jnp.sum(jnp.where(lane == col0 + s, codes_all, 0), axis=1,
                       keepdims=True)
        xp = _select_xp(code, w_ref, bin_ref[0], mask, channels, units,
                        block2)
        rp = jnp.dot(h, u_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST) + brec_ref[0]
        z = jax.nn.sigmoid(xp[:, :units] + rp[:, :units])
        r = jax.nn.sigmoid(xp[:, units:2 * units] + rp[:, units:2 * units])
        hh = jnp.tanh(xp[:, 2 * units:] + r * rp[:, 2 * units:])
        h = z * h + (1.0 - z) * hh
        hseq_ref[:, s, :] = h
        avg_ref[:, s, :] = (h[:block_b] + h[block_b:]) * 0.5
        if s == last_sub:
            @pl.when(t == last_tile)
            def _(h=h):
                hidden_ref[:] = (h[:block_b] + h[block_b:]) * 0.5
    h_ref[:] = h


def _gru_train_bwd_kernel(codes_ref, mask_ref, w_ref, u_ref, ut_ref,
                          brec_ref, hprev_ref, davg_ref, dhid_ref,
                          dw_ref, du_ref, db_ref, dh_ref, *, units: int,
                          time_block: int, channels: int, t_steps: int,
                          n_ttiles: int, has_mask: bool):
    i = pl.program_id(0)
    t = pl.program_id(1)  # 0 = LAST time tile (reverse grid)

    @pl.when((i == 0) & (t == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        du_ref[:] = jnp.zeros_like(du_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    block2 = codes_ref.shape[0]
    block_b = block2 // 2

    @pl.when(t == 0)
    def _():
        # The final-state cotangent seeds the carry (hidden = branch avg
        # of the last states -> each branch row gets dhid/2).
        half = dhid_ref[:] * 0.5
        dh_ref[:block_b] = half
        dh_ref[block_b:] = half

    tile = n_ttiles - 1 - t  # data tile this grid step works on
    tiles_per_block = _CODE_COLS // time_block
    col0 = (tile % tiles_per_block) * time_block
    codes_all = codes_ref[:]
    mask = mask_ref[:] if has_mask else None
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _CODE_COLS), 1)

    dh = dh_ref[:]
    dw_acc = dw_ref[:]
    du_acc = du_ref[:]
    db_acc = db_ref[:]
    for s in reversed(range(time_block)):
        t_global = tile * time_block + s
        valid = t_global < t_steps  # padded steps never touched the loss
        code = jnp.sum(jnp.where(lane == col0 + s, codes_all, 0), axis=1,
                       keepdims=True)
        h_prev = hprev_ref[:, s, :]
        xp = _select_xp(code, w_ref, jnp.zeros((3 * units,), jnp.float32),
                        mask, channels, units, block2)
        # b_in cancels in no gradient? No: forward xp includes b_in; the
        # recompute needs it for gate values.
        rp = jnp.dot(h_prev, u_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST) + brec_ref[1]
        xp = xp + brec_ref[0]
        z = jax.nn.sigmoid(xp[:, :units] + rp[:, :units])
        r = jax.nn.sigmoid(xp[:, units:2 * units] + rp[:, units:2 * units])
        rh = rp[:, 2 * units:]
        hh = jnp.tanh(xp[:, 2 * units:] + r * rh)

        davg_s = davg_ref[:, s, :] * 0.5
        dht = dh + jnp.concatenate([davg_s, davg_s], axis=0)

        da_z = dht * (h_prev - hh) * z * (1.0 - z)
        da_h = dht * (1.0 - z) * (1.0 - hh * hh)
        da_r = (da_h * rh) * r * (1.0 - r)
        d_xp = jnp.concatenate([da_z, da_r, da_h], axis=1)
        d_rp = jnp.concatenate([da_z, da_r, da_h * r], axis=1)

        dh_new = dht * z + jnp.dot(
            d_rp, ut_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        dh = jnp.where(valid, dh_new, dh)

        d_rp = jnp.where(valid, d_rp, 0.0)
        d_xp = jnp.where(valid, d_xp, 0.0)
        du_acc = du_acc + jax.lax.dot_general(
            h_prev, d_rp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        db_acc = db_acc + jnp.stack(
            [jnp.sum(d_xp, axis=0), jnp.sum(d_rp, axis=0)])
        dw_rows = []
        for c in range(channels):
            contrib = d_xp * (code == c).astype(jnp.float32)
            if mask is not None:
                contrib = contrib * _gate_mask_scale(mask, c, channels,
                                                     units, block2, 3)
            dw_rows.append(jnp.sum(contrib, axis=0))
        # Stacked dense add (a per-row .at[c].add would lower to
        # scatter-add, which Mosaic does not implement).
        dw_acc = dw_acc + jnp.stack(dw_rows)
    dh_ref[:] = dh
    dw_ref[:] = dw_acc
    du_ref[:] = du_acc
    db_ref[:] = db_acc


def _prep_codes(codes_fwd, codes_rev, block_b: int, time_block: int,
                channels: int):
    batch, t_steps = codes_fwd.shape
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
    paired = jnp.concatenate([cf, cr], axis=1).reshape(
        2 * padded_b, padded_t + pad_cols)
    return paired.astype(jnp.int32), padded_b, padded_t


@functools.partial(jax.jit,
                   static_argnames=("block_b", "time_block", "has_mask"))
def _fwd_call(codes_fwd, codes_rev, masks, kernel, bias, recurrent,
              block_b: int, time_block: int, has_mask: bool):
    batch, t_steps = codes_fwd.shape
    channels = kernel.shape[0]
    units = recurrent.shape[0]
    codes_paired, padded_b, padded_t = _prep_codes(
        codes_fwd, codes_rev, block_b, time_block, channels)
    n_bblocks = padded_b // block_b
    tiles_per_block = _CODE_COLS // time_block

    if has_mask:
        # masks [3, 2B, channels] -> paired rows [2B_pad, 3*channels]
        m = jnp.moveaxis(masks, 0, 1).reshape(2 * batch, 3 * channels)
        mf = m[:batch]
        mr = m[batch:]
        if padded_b != batch:
            pad = ((0, padded_b - batch), (0, 0))
            mf = jnp.pad(mf, pad)
            mr = jnp.pad(mr, pad)
        m_paired = jnp.concatenate([
            mf.reshape(n_bblocks, block_b, -1),
            mr.reshape(n_bblocks, block_b, -1)
        ], axis=1).reshape(2 * padded_b, 3 * channels)
    else:
        m_paired = jnp.zeros((2 * padded_b, 3 * channels), jnp.float32)

    grid = (n_bblocks, padded_t // time_block)
    avg, hidden, hseq = pl.pallas_call(
        functools.partial(_gru_train_fwd_kernel, units=units,
                          time_block=time_block, channels=channels,
                          last_tile=(t_steps - 1) // time_block,
                          last_sub=(t_steps - 1) % time_block,
                          has_mask=has_mask),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * block_b, _CODE_COLS),
                         lambda i, t, n=tiles_per_block: (i, t // n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * block_b, 3 * channels), lambda i, t: (i, 0),
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
            pl.BlockSpec((2 * block_b, time_block, units),
                         lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded_b, padded_t, units), jnp.float32),
            jax.ShapeDtypeStruct((padded_b, units), jnp.float32),
            jax.ShapeDtypeStruct((2 * padded_b, padded_t, units),
                                 jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2 * block_b, units), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(codes_paired, m_paired, kernel.astype(jnp.float32),
      bias[:1].reshape(1, 3 * units).astype(jnp.float32),
      recurrent.astype(jnp.float32),
      bias[1:].reshape(1, 3 * units).astype(jnp.float32))
    return (avg[:batch, :t_steps], hidden[:batch],
            hseq, codes_paired, m_paired)


@functools.partial(jax.jit,
                   static_argnames=("block_b", "time_block", "t_steps",
                                    "has_mask"))
def _bwd_call(codes_paired, m_paired, kernel, bias, recurrent, hseq,
              d_avg, d_hidden, block_b: int, time_block: int,
              t_steps: int, has_mask: bool):
    channels = kernel.shape[0]
    units = recurrent.shape[0]
    padded_b2, padded_t = hseq.shape[0], hseq.shape[1]
    padded_b = padded_b2 // 2
    batch = d_avg.shape[0]
    n_bblocks = padded_b // block_b
    n_ttiles = padded_t // time_block
    tiles_per_block = _CODE_COLS // time_block

    # h_prev sequence: zeros at t=0, h_{t-1} elsewhere (the only residual
    # the backward recompute needs).
    hprev = jnp.concatenate(
        [jnp.zeros((padded_b2, 1, units), jnp.float32), hseq[:, :-1]],
        axis=1)
    if batch != padded_b or d_avg.shape[1] != padded_t:
        d_avg = jnp.pad(d_avg.astype(jnp.float32),
                        ((0, padded_b - batch),
                         (0, padded_t - d_avg.shape[1]), (0, 0)))
        d_hidden = jnp.pad(d_hidden.astype(jnp.float32),
                           ((0, padded_b - batch), (0, 0)))
    else:
        d_avg = d_avg.astype(jnp.float32)
        d_hidden = d_hidden.astype(jnp.float32)

    grid = (n_bblocks, n_ttiles)

    def rev_t(i, t, nt=n_ttiles):
        return (i, nt - 1 - t, 0)

    dw, du, db = pl.pallas_call(
        functools.partial(_gru_train_bwd_kernel, units=units,
                          time_block=time_block, channels=channels,
                          t_steps=t_steps, n_ttiles=n_ttiles,
                          has_mask=has_mask),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (2 * block_b, _CODE_COLS),
                lambda i, t, n=tiles_per_block, nt=n_ttiles:
                (i, (nt - 1 - t) // n), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * block_b, 3 * channels), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((channels, 3 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((units, 3 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * units, units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * block_b, time_block, units), rev_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, time_block, units), rev_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, units), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((channels, 3 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((units, 3 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((channels, 3 * units), jnp.float32),
            jax.ShapeDtypeStruct((units, 3 * units), jnp.float32),
            jax.ShapeDtypeStruct((2, 3 * units), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2 * block_b, units), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(codes_paired, m_paired, kernel.astype(jnp.float32),
      recurrent.astype(jnp.float32),
      recurrent.astype(jnp.float32).T,
      bias.reshape(2, 3 * units).astype(jnp.float32),
      hprev, d_avg, d_hidden)
    return dw, du, db


# -- custom-vjp wrapper ------------------------------------------------------

# block_b for training batches.  The backward kernel's 8-step unrolled
# loop keeps ~10 [2*bb, 3u] temporaries live per step on the Mosaic
# stack; bb=256 blows the 16 MB scoped-VMEM limit at the flagship shape
# (measured: 32.7 MB requested), bb=128 is the largest size that
# compiles AND the measured fastest (benchmarks/train_kernel_bench.json).
_TRAIN_BLOCK_B = int(__import__("os").environ.get(
    "DEEPGRP_TRAIN_BLOCK_B", "128"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_gru_avg_train(params, codes, masks, has_mask: bool = True):
    """Fused fwd+revcomp GRU with branch averaging, TRAINABLE.

    Args:
        params: GRU params (Keras layout: kernel [5, 3u], recurrent
            [u, 3u], bias [2, 3u]).
        codes: ``[B, T]`` int base codes (A=0..T=3, N=4, pad/zero-row=5).
        masks: ``[3, 2B, channels]`` per-gate input dropout masks over the
            doubled batch (rows 0..B-1 forward branch, B..2B-1 revcomp
            branch — exactly what ``rnn._input_dropout_masks`` draws), or
            ones/ignored when ``has_mask=False``.

    Returns:
        ``(avg [B, T, u] f32, hidden_avg [B, u] f32)``.
    """
    avg, hidden, *_ = _fwd_impl(params, codes, masks, has_mask)
    return avg, hidden


def _fwd_impl(params, codes, masks, has_mask):
    comp = jnp.asarray(_COMPLEMENT_CODES, dtype=codes.dtype)
    codes_rev = comp[codes[:, ::-1]]
    block_b = min(_TRAIN_BLOCK_B, max(codes.shape[0], 8))
    return _fwd_call(codes, codes_rev, masks, params["kernel"],
                     params["bias"], params["recurrent"], block_b,
                     _TIME_BLOCK, has_mask) + (block_b,)


def _vjp_fwd(params, codes, masks, has_mask):
    avg, hidden, hseq, codes_paired, m_paired, block_b = _fwd_impl(
        params, codes, masks, has_mask)
    res = (params, codes_paired, m_paired, hseq, codes.shape[1], block_b)
    return (avg, hidden), res


def _vjp_bwd(has_mask, res, cotangents):
    params, codes_paired, m_paired, hseq, t_steps, block_b = res
    d_avg, d_hidden = cotangents
    dw, du, db = _bwd_call(codes_paired, m_paired, params["kernel"],
                           params["bias"], params["recurrent"], hseq,
                           d_avg, d_hidden, block_b, _TIME_BLOCK, t_steps,
                           has_mask)
    d_params = {
        "kernel": dw.astype(params["kernel"].dtype),
        "recurrent": du.astype(params["recurrent"].dtype),
        "bias": db.reshape(params["bias"].shape).astype(
            params["bias"].dtype),
    }
    return (d_params, None, None)


pallas_gru_avg_train.defvjp(_vjp_fwd, _vjp_bwd)


# -- LSTM training kernels ---------------------------------------------------
#
# Same structure as the GRU pair; differences: 4 gates (Keras order
# i, f, c~, o — models/rnn.py:_lstm_apply), a single bias row [4u], and a
# SECOND carried state (the cell state c alongside h), so the forward
# also spools ``cseq`` and the backward carries ``(dh, dc)``.
#
# Gate math:   i = sigmoid(a_i)  f = sigmoid(a_f)  g = tanh(a_g)
#              o = sigmoid(a_o)  with  a = xp + h_prev @ U
#              c = f * c_prev + i * g      h = o * tanh(c)
# Backward per step given (dh, dc):
#              do   = dh * tanh(c)
#              dc_t = dc + dh * o * (1 - tanh(c)^2)
#              di = dc_t * g   df = dc_t * c_prev   dg = dc_t * i
#              da = [di*i(1-i), df*f(1-f), dg*(1-g^2), do*o(1-o)]
#              dh_prev = da @ U^T          dc_prev = dc_t * f
#              dU += h_prev^T da   db += sum da   dW[ch] += masked select


def _lstm_train_fwd_kernel(codes_ref, mask_ref, w_ref, b_ref, u_ref,
                           avg_ref, hidden_ref, hseq_ref, cseq_ref, h_ref,
                           c_ref, *, units: int, time_block: int,
                           channels: int, last_tile: int, last_sub: int,
                           has_mask: bool):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    block2 = codes_ref.shape[0]
    block_b = block2 // 2
    tiles_per_block = _CODE_COLS // time_block
    col0 = (t % tiles_per_block) * time_block
    codes_all = codes_ref[:]
    mask = mask_ref[:] if has_mask else None
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _CODE_COLS), 1)
    h = h_ref[:]
    c = c_ref[:]
    for s in range(time_block):
        code = jnp.sum(jnp.where(lane == col0 + s, codes_all, 0), axis=1,
                       keepdims=True)
        xp = _select_xp(code, w_ref, b_ref[0], mask, channels, units,
                        block2, n_gates=4)
        gates = xp + jnp.dot(h, u_ref[:],
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
        i = jax.nn.sigmoid(gates[:, :units])
        f = jax.nn.sigmoid(gates[:, units:2 * units])
        g = jnp.tanh(gates[:, 2 * units:3 * units])
        o = jax.nn.sigmoid(gates[:, 3 * units:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        hseq_ref[:, s, :] = h
        cseq_ref[:, s, :] = c
        avg_ref[:, s, :] = (h[:block_b] + h[block_b:]) * 0.5
        if s == last_sub:
            @pl.when(t == last_tile)
            def _(h=h):
                hidden_ref[:] = (h[:block_b] + h[block_b:]) * 0.5
    h_ref[:] = h
    c_ref[:] = c


def _lstm_train_bwd_kernel(codes_ref, mask_ref, w_ref, u_ref, ut_ref,
                           b_ref, hprev_ref, cprev_ref, davg_ref, dhid_ref,
                           dw_ref, du_ref, db_ref, dh_ref, dc_ref, *,
                           units: int, time_block: int, channels: int,
                           t_steps: int, n_ttiles: int, has_mask: bool):
    i_blk = pl.program_id(0)
    t = pl.program_id(1)  # 0 = LAST time tile (reverse grid)

    @pl.when((i_blk == 0) & (t == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        du_ref[:] = jnp.zeros_like(du_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    block2 = codes_ref.shape[0]
    block_b = block2 // 2

    @pl.when(t == 0)
    def _():
        half = dhid_ref[:] * 0.5
        dh_ref[:block_b] = half
        dh_ref[block_b:] = half
        dc_ref[:] = jnp.zeros_like(dc_ref)

    tile = n_ttiles - 1 - t
    tiles_per_block = _CODE_COLS // time_block
    col0 = (tile % tiles_per_block) * time_block
    codes_all = codes_ref[:]
    mask = mask_ref[:] if has_mask else None
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _CODE_COLS), 1)

    dh = dh_ref[:]
    dc = dc_ref[:]
    dw_acc = dw_ref[:]
    du_acc = du_ref[:]
    db_acc = db_ref[:]
    for s in reversed(range(time_block)):
        t_global = tile * time_block + s
        valid = t_global < t_steps
        code = jnp.sum(jnp.where(lane == col0 + s, codes_all, 0), axis=1,
                       keepdims=True)
        h_prev = hprev_ref[:, s, :]
        c_prev = cprev_ref[:, s, :]
        xp = _select_xp(code, w_ref, b_ref[0], mask, channels, units,
                        block2, n_gates=4)
        gates = xp + jnp.dot(h_prev, u_ref[:],
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
        gi = jax.nn.sigmoid(gates[:, :units])
        gf = jax.nn.sigmoid(gates[:, units:2 * units])
        gg = jnp.tanh(gates[:, 2 * units:3 * units])
        go = jax.nn.sigmoid(gates[:, 3 * units:])
        c_t = gf * c_prev + gi * gg
        tanh_c = jnp.tanh(c_t)

        davg_s = davg_ref[:, s, :] * 0.5
        dht = dh + jnp.concatenate([davg_s, davg_s], axis=0)

        do = dht * tanh_c
        dc_t = dc + dht * go * (1.0 - tanh_c * tanh_c)
        da = jnp.concatenate([
            (dc_t * gg) * gi * (1.0 - gi),
            (dc_t * c_prev) * gf * (1.0 - gf),
            (dc_t * gi) * (1.0 - gg * gg),
            do * go * (1.0 - go),
        ], axis=1)

        dh_new = jnp.dot(da, ut_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        dh = jnp.where(valid, dh_new, dh)
        dc = jnp.where(valid, dc_t * gf, dc)

        da = jnp.where(valid, da, 0.0)
        du_acc = du_acc + jax.lax.dot_general(
            h_prev, da, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        db_acc = db_acc + jnp.sum(da, axis=0, keepdims=True)
        dw_rows = []
        for ch in range(channels):
            contrib = da * (code == ch).astype(jnp.float32)
            if mask is not None:
                contrib = contrib * _gate_mask_scale(mask, ch, channels,
                                                     units, block2, 4)
            dw_rows.append(jnp.sum(contrib, axis=0))
        dw_acc = dw_acc + jnp.stack(dw_rows)
    dh_ref[:] = dh
    dc_ref[:] = dc
    dw_ref[:] = dw_acc
    du_ref[:] = du_acc
    db_ref[:] = db_acc


@functools.partial(jax.jit,
                   static_argnames=("block_b", "time_block", "has_mask"))
def _lstm_fwd_call(codes_fwd, codes_rev, masks, kernel, bias, recurrent,
                   block_b: int, time_block: int, has_mask: bool):
    batch, t_steps = codes_fwd.shape
    channels = kernel.shape[0]
    units = recurrent.shape[0]
    codes_paired, padded_b, padded_t = _prep_codes(
        codes_fwd, codes_rev, block_b, time_block, channels)
    n_bblocks = padded_b // block_b
    tiles_per_block = _CODE_COLS // time_block

    if has_mask:
        m = jnp.moveaxis(masks, 0, 1).reshape(2 * batch, 4 * channels)
        mf = m[:batch]
        mr = m[batch:]
        if padded_b != batch:
            pad = ((0, padded_b - batch), (0, 0))
            mf = jnp.pad(mf, pad)
            mr = jnp.pad(mr, pad)
        m_paired = jnp.concatenate([
            mf.reshape(n_bblocks, block_b, -1),
            mr.reshape(n_bblocks, block_b, -1)
        ], axis=1).reshape(2 * padded_b, 4 * channels)
    else:
        m_paired = jnp.zeros((2 * padded_b, 4 * channels), jnp.float32)

    grid = (n_bblocks, padded_t // time_block)
    avg, hidden, hseq, cseq = pl.pallas_call(
        functools.partial(_lstm_train_fwd_kernel, units=units,
                          time_block=time_block, channels=channels,
                          last_tile=(t_steps - 1) // time_block,
                          last_sub=(t_steps - 1) % time_block,
                          has_mask=has_mask),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * block_b, _CODE_COLS),
                         lambda i, t, n=tiles_per_block: (i, t // n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * block_b, 4 * channels), lambda i, t: (i, 0),
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
            pl.BlockSpec((2 * block_b, time_block, units),
                         lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * block_b, time_block, units),
                         lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded_b, padded_t, units), jnp.float32),
            jax.ShapeDtypeStruct((padded_b, units), jnp.float32),
            jax.ShapeDtypeStruct((2 * padded_b, padded_t, units),
                                 jnp.float32),
            jax.ShapeDtypeStruct((2 * padded_b, padded_t, units),
                                 jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2 * block_b, units), jnp.float32),
                        pltpu.VMEM((2 * block_b, units), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(codes_paired, m_paired, kernel.astype(jnp.float32),
      bias.reshape(1, 4 * units).astype(jnp.float32),
      recurrent.astype(jnp.float32))
    return (avg[:batch, :t_steps], hidden[:batch], hseq, cseq,
            codes_paired, m_paired)


@functools.partial(jax.jit,
                   static_argnames=("block_b", "time_block", "t_steps",
                                    "has_mask"))
def _lstm_bwd_call(codes_paired, m_paired, kernel, bias, recurrent, hseq,
                   cseq, d_avg, d_hidden, block_b: int, time_block: int,
                   t_steps: int, has_mask: bool):
    channels = kernel.shape[0]
    units = recurrent.shape[0]
    padded_b2, padded_t = hseq.shape[0], hseq.shape[1]
    padded_b = padded_b2 // 2
    batch = d_avg.shape[0]
    n_bblocks = padded_b // block_b
    n_ttiles = padded_t // time_block
    tiles_per_block = _CODE_COLS // time_block

    zrow = jnp.zeros((padded_b2, 1, units), jnp.float32)
    hprev = jnp.concatenate([zrow, hseq[:, :-1]], axis=1)
    cprev = jnp.concatenate([zrow, cseq[:, :-1]], axis=1)
    if batch != padded_b or d_avg.shape[1] != padded_t:
        d_avg = jnp.pad(d_avg.astype(jnp.float32),
                        ((0, padded_b - batch),
                         (0, padded_t - d_avg.shape[1]), (0, 0)))
        d_hidden = jnp.pad(d_hidden.astype(jnp.float32),
                           ((0, padded_b - batch), (0, 0)))
    else:
        d_avg = d_avg.astype(jnp.float32)
        d_hidden = d_hidden.astype(jnp.float32)

    grid = (n_bblocks, n_ttiles)

    def rev_t(i, t, nt=n_ttiles):
        return (i, nt - 1 - t, 0)

    dw, du, db = pl.pallas_call(
        functools.partial(_lstm_train_bwd_kernel, units=units,
                          time_block=time_block, channels=channels,
                          t_steps=t_steps, n_ttiles=n_ttiles,
                          has_mask=has_mask),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (2 * block_b, _CODE_COLS),
                lambda i, t, n=tiles_per_block, nt=n_ttiles:
                (i, (nt - 1 - t) // n), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * block_b, 4 * channels), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((channels, 4 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((units, 4 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * units, units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * block_b, time_block, units), rev_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * block_b, time_block, units), rev_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, time_block, units), rev_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, units), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((channels, 4 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((units, 4 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * units), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((channels, 4 * units), jnp.float32),
            jax.ShapeDtypeStruct((units, 4 * units), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * units), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2 * block_b, units), jnp.float32),
                        pltpu.VMEM((2 * block_b, units), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(codes_paired, m_paired, kernel.astype(jnp.float32),
      recurrent.astype(jnp.float32),
      recurrent.astype(jnp.float32).T,
      bias.reshape(1, 4 * units).astype(jnp.float32),
      hprev, cprev, d_avg, d_hidden)
    return dw, du, db


# The LSTM backward keeps ~12 [2*bb, 4u] temporaries live per unrolled
# step (4 gates vs the GRU's 3) — bb=64 is the conservative default;
# raise via the env var after sweeping a given shape on hardware.
_LSTM_TRAIN_BLOCK_B = int(__import__("os").environ.get(
    "DEEPGRP_LSTM_TRAIN_BLOCK_B", "64"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_lstm_avg_train(params, codes, masks, has_mask: bool = True):
    """Fused fwd+revcomp LSTM with branch averaging, TRAINABLE.

    LSTM counterpart of :func:`pallas_gru_avg_train` — same contract
    (``codes [B, T]`` int base codes + ``masks [4, 2B, channels]``
    per-gate input dropout masks in, ``(avg [B, T, u], hidden_avg
    [B, u])`` out), matching the reference's LSTM cell option
    (/root/reference/deepgrp/model.py:218-230).  The backward kernel
    recomputes the four gates from the carried ``(h, c)`` sequences and
    carries ``(dh, dc)`` cotangents across the reverse time grid.
    """
    avg, hidden, *_ = _lstm_fwd_impl(params, codes, masks, has_mask)
    return avg, hidden


def _lstm_fwd_impl(params, codes, masks, has_mask):
    comp = jnp.asarray(_COMPLEMENT_CODES, dtype=codes.dtype)
    codes_rev = comp[codes[:, ::-1]]
    block_b = min(_LSTM_TRAIN_BLOCK_B, max(codes.shape[0], 8))
    return _lstm_fwd_call(codes, codes_rev, masks, params["kernel"],
                          params["bias"], params["recurrent"], block_b,
                          _TIME_BLOCK, has_mask) + (block_b,)


def _lstm_vjp_fwd(params, codes, masks, has_mask):
    avg, hidden, hseq, cseq, codes_paired, m_paired, block_b = (
        _lstm_fwd_impl(params, codes, masks, has_mask))
    res = (params, codes_paired, m_paired, hseq, cseq, codes.shape[1],
           block_b)
    return (avg, hidden), res


def _lstm_vjp_bwd(has_mask, res, cotangents):
    params, codes_paired, m_paired, hseq, cseq, t_steps, block_b = res
    d_avg, d_hidden = cotangents
    dw, du, db = _lstm_bwd_call(codes_paired, m_paired, params["kernel"],
                                params["bias"], params["recurrent"], hseq,
                                cseq, d_avg, d_hidden, block_b,
                                _TIME_BLOCK, t_steps, has_mask)
    d_params = {
        "kernel": dw.astype(params["kernel"].dtype),
        "recurrent": du.astype(params["recurrent"].dtype),
        "bias": db.reshape(params["bias"].shape).astype(
            params["bias"].dtype),
    }
    return (d_params, None, None)


pallas_lstm_avg_train.defvjp(_lstm_vjp_fwd, _lstm_vjp_bwd)
