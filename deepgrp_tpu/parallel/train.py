"""Data-parallel training step.

Model weights and optimizer state are replicated; each device samples its
own slice of the class-balanced batch (PRNG key folded with the device
index), computes local gradients, and gradients are ``psum``-averaged over
the mesh's ICI before the (replicated) optimizer update.  Inside one jit:
sample -> gather -> forward/backward -> all-reduce -> update.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from deepgrp_tpu.config import Options
from deepgrp_tpu.models.model import DeepGRPModel
from deepgrp_tpu.parallel.mesh import DATA_AXIS
from deepgrp_tpu.train import sampler as sampler_lib
from deepgrp_tpu.train.sampler import BatchSampler
from deepgrp_tpu.train.training import categorical_crossentropy


def _make_device_step(model: DeepGRPModel,
                      optimizer: optax.GradientTransformation,
                      options: Options, train_sampler: BatchSampler,
                      n_dev: int, fused: bool = False):
    """Per-device step body run inside ``shard_map`` (sample local slice,
    local grads, ``pmean`` over ICI, replicated update).

    ``fused=True`` takes the Pallas custom-VJP train-kernel path
    (models/pallas_rnn_train.py, the measured 1.64x single-chip winner):
    ``fwd`` must then be the compact CODES buffer ``int [L]`` (see
    ``train.training.codes_from_onehot_rows``) — each device slices its
    local code windows and runs the fused fwd+bwd recurrence; the
    ``pmean`` all-reduce over ICI is unchanged.
    """
    if train_sampler.batch_size % n_dev:
        raise ValueError(
            f"batch_size {train_sampler.batch_size} not divisible by "
            f"{n_dev} devices")
    local_batch = train_sampler.batch_size // n_dev
    vecsize = int(options.vecsize)
    n_sampled = train_sampler.n_sampled_classes
    ocs_global = train_sampler.one_class_size
    seq_len = train_sampler.seq_len

    def device_step(params, opt_state, key, fwd, lbl, candidates, lengths):
        dev_idx = jax.lax.axis_index(DATA_AXIS)
        key = jax.random.fold_in(key, dev_idx)
        key_sample, key_dropout = jax.random.split(key)
        # Exact global class quotas (each class contributes exactly
        # one_class_size starts summed over the mesh; see
        # sampler._sample_starts_dp).
        starts = sampler_lib._sample_starts_dp(
            key_sample, candidates, lengths, n_sampled, ocs_global, n_dev,
            dev_idx, local_batch, seq_len, vecsize)

        def cut(buf, start):
            return jax.lax.dynamic_slice(buf, (start, 0),
                                         (vecsize, buf.shape[1]))

        y = jax.vmap(lambda s: cut(lbl, s))(starts).astype(jnp.float32)
        if fused:
            from deepgrp_tpu.models.model import (
                forward_logits_from_codes_train)

            codes = jax.vmap(lambda s: jax.lax.dynamic_slice(
                fwd, (s,), (vecsize,)))(starts)

            def loss_fn(p):
                logits = forward_logits_from_codes_train(
                    p, codes, model.config, dropout_key=key_dropout)
                return categorical_crossentropy(logits, y)
        else:
            x = jax.vmap(lambda s: cut(fwd, s))(starts).astype(jnp.float32)

            def loss_fn(p):
                logits = model.apply_logits(p, x, deterministic=False,
                                            dropout_key=key_dropout)
                return categorical_crossentropy(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return device_step


def make_dp_train_step(model: DeepGRPModel,
                       optimizer: optax.GradientTransformation,
                       mesh: Mesh, options: Options,
                       train_sampler: BatchSampler, fused: bool = False):
    """Build a jitted data-parallel train step.

    The per-device batch is ``batch_size // n_devices`` (``batch_size`` must
    divide evenly).  Returns
    ``step(params, opt_state, key, fwd, lbl, candidates, lengths)
    -> (params, opt_state, loss)`` where data arrays are replicated
    (``fwd`` is the compact codes buffer when ``fused``).
    """
    device_step = _make_device_step(model, optimizer, options, train_sampler,
                                    mesh.shape[DATA_AXIS], fused=fused)
    sharded = jax.shard_map(
        device_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0, 1))


def make_dp_train_epoch(model: DeepGRPModel,
                        optimizer: optax.GradientTransformation,
                        mesh: Mesh, options: Options,
                        train_sampler: BatchSampler, n_steps: int,
                        fused: bool = False):
    """Data-parallel whole-epoch program: ``n_steps`` DP steps as one
    ``lax.scan`` inside the ``shard_map`` — one dispatch per epoch (see
    ``train/training.py:_train_epoch``), with the per-step ``pmean``
    all-reduces riding ICI inside the scan.  The key chain (one ``split``
    per step, then per-device ``fold_in``) matches the per-step driver.

    Returns ``epoch(params, opt_state, key, fwd, lbl, candidates, lengths)
    -> (params, opt_state, key, losses [n_steps])``; with ``fused`` the
    ``fwd`` argument is the compact codes buffer and every device runs
    the Pallas custom-VJP recurrence kernels inside the scan.
    """
    device_step = _make_device_step(model, optimizer, options, train_sampler,
                                    mesh.shape[DATA_AXIS], fused=fused)

    def device_epoch(params, opt_state, key, fwd, lbl, candidates, lengths):
        def body(carry, _):
            params, opt_state, key = carry
            key, step_key = jax.random.split(key)
            params, opt_state, loss = device_step(
                params, opt_state, step_key, fwd, lbl, candidates, lengths)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), None, length=n_steps)
        return params, opt_state, key, losses

    sharded = jax.shard_map(
        device_epoch, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0, 1))


def dp_train_arrays(train_sampler: BatchSampler) -> Tuple:
    """The replicated device arrays a DP step needs from a sampler."""
    return (train_sampler._fwd, train_sampler._lbl,
            train_sampler._candidates, train_sampler._lengths)
