"""Training loop.

Reference behavior (``/root/reference/deepgrp/training.py:15-73``): generator
datasets for train/val, per-epoch loop of ``n_batches`` steps, one
validation batch per epoch, EarlyStopping on val_loss with patience
``early_stopping_th`` and best-weight restoration, per-epoch best-only
weight checkpoints into ``logdir``, TensorBoard metrics.

TPU-native design: the whole optimization step (sample -> forward ->
loss -> backward -> update) is device code with donated params/optimizer
state, and a whole EPOCH (``n_batches`` steps) runs as one ``lax.scan``
program — a single dispatch per epoch, so host round-trip latency never
sits between steps.  The loss is categorical cross-entropy
computed from logits (``log_softmax``) — numerically equivalent to the
reference's CCE-on-softmax (model.py:333-334) but stable.  Metrics stream
to ``logdir/metrics.jsonl`` and, when available, TensorBoard event files.
"""

from __future__ import annotations

import json
import logging
import os
import time
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepgrp_tpu.config import Options
from deepgrp_tpu.data.preprocess import Data
from deepgrp_tpu.models.model import DeepGRPModel, create_model
from deepgrp_tpu.train.checkpoint import CheckpointManager
from deepgrp_tpu.train.optimizers import get_optimizer
from deepgrp_tpu.train.sampler import BatchSampler

_LOG = logging.getLogger(__name__)

MetricCallback = Callable[[int, Dict[str, float]], None]


def categorical_crossentropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean categorical cross-entropy over batch and positions."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(labels * log_probs, axis=-1))


class MetricsWriter:
    """JSONL metrics log with TensorBoard event mirroring.

    TB events are written unconditionally when requested (reference
    parity: the TensorBoard callback always runs, training.py:40-45) —
    via torch's ``SummaryWriter`` when importable, else the dependency-
    free writer in utils/tb_events.py.
    """

    def __init__(self, logdir: os.PathLike, tensorboard: bool = False):
        self.logdir = os.fspath(logdir)
        os.makedirs(self.logdir, exist_ok=True)
        self._file = open(os.path.join(self.logdir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:  # torch's TB writer; optional and slow to import
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=self.logdir)
            except Exception:
                from deepgrp_tpu.utils.tb_events import EventFileWriter

                self._tb = EventFileWriter(self.logdir)
                _LOG.info("torch unavailable; using built-in TB writer")

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        record = {"step": step, "time": time.time(), **metrics}
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._tb is not None:
            for key, value in metrics.items():
                self._tb.add_scalar(key, value, step)

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()


def _train_step_body(params, opt_state, key, fwd, lbl, candidates, lengths,
                     sampler_static, model: DeepGRPModel,
                     optimizer: optax.GradientTransformation, vecsize: int,
                     fused: bool = False):
    """One optimization step: sample, gather, forward/backward, update.

    ``fused=True`` takes the Pallas train-kernel path
    (models/pallas_rnn_train.py): ``fwd`` must then be the compact CODES
    buffer ``int [L]`` (see :func:`codes_from_onehot_rows`) instead of the
    one-hot ``[L, 5]`` rows, and the recurrence fwd+bwd runs in two fused
    VMEM kernels instead of the XLA scan.
    """
    from deepgrp_tpu.models.model import forward_logits_from_codes_train
    from deepgrp_tpu.train import sampler as sampler_lib

    n_sampled, ocs, batch, seq_len = sampler_static
    key_sample, key_dropout = jax.random.split(key)
    starts = sampler_lib._sample_starts(key_sample, candidates, lengths,
                                        n_sampled, ocs, batch, seq_len,
                                        vecsize)

    def cut(buf, start):
        return jax.lax.dynamic_slice(buf, (start, 0),
                                     (vecsize, buf.shape[1]))

    y = jax.vmap(lambda s: cut(lbl, s))(starts).astype(jnp.float32)
    if fused:
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
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def codes_from_onehot_rows(fwd_rows: jax.Array) -> jax.Array:
    """One-hot rows ``[L, 5]`` -> compact codes ``int32 [L]`` (zero rows,
    e.g. hard-masked positions, map to the kernel's pad code 5)."""
    occupied = jnp.sum(fwd_rows, axis=1) > 0
    return jnp.where(occupied, jnp.argmax(fwd_rows, axis=1),
                     5).astype(jnp.int32)


_train_step = partial(jax.jit,
                      static_argnames=("model", "optimizer", "vecsize",
                                       "sampler_static", "fused"),
                      donate_argnums=(0, 1))(_train_step_body)


@partial(jax.jit,
         static_argnames=("model", "optimizer", "vecsize", "sampler_static",
                          "n_steps", "fused"),
         donate_argnums=(0, 1))
def _train_epoch(params, opt_state, key, fwd, lbl, candidates, lengths,
                 sampler_static, model: DeepGRPModel,
                 optimizer: optax.GradientTransformation, vecsize: int,
                 n_steps: int, fused: bool = False):
    """A whole epoch (``n_steps`` optimization steps) as ONE device
    program: the per-step loop runs as a ``lax.scan`` with donated
    params/optimizer state, so an epoch costs a single dispatch instead of
    ``n_batches`` host round-trips (which dominate when the chip sits
    behind a high-latency link, and still cost ~XLA dispatch overhead
    when it doesn't).  The PRNG key chain (one ``split`` per step, carried
    forward) matches the host-loop formulation exactly.

    Returns ``(params, opt_state, key, losses [n_steps])``.
    """

    def body(carry, _):
        params, opt_state, key = carry
        key, step_key = jax.random.split(key)
        params, opt_state, loss = _train_step_body(
            params, opt_state, step_key, fwd, lbl, candidates, lengths,
            sampler_static, model, optimizer, vecsize, fused=fused)
        return (params, opt_state, key), loss

    (params, opt_state, key), losses = jax.lax.scan(
        body, (params, opt_state, key), None, length=n_steps)
    return params, opt_state, key, losses


@partial(jax.jit, static_argnames=("model",))
def _eval_step(params, x, y, model: DeepGRPModel):
    logits = model.apply_logits(params, x, deterministic=True)
    return categorical_crossentropy(logits, y)


def _rep_tree(tree, replicated_sharding):
    """Replicate a pytree onto a (possibly multi-process) mesh from the
    per-process host copies."""
    return jax.tree.map(
        lambda a: jax.device_put(np.asarray(a), replicated_sharding), tree)


class Trainer:
    """Reusable training driver for one model/options pair.

    ``mesh`` switches the optimization step to the data-parallel
    ``shard_map`` step (parallel/train.py): each device samples its own
    slice of the class-balanced batch and gradients are ``pmean``-reduced
    over ICI before the replicated update.  Checkpointing, early stopping,
    NaN containment and the metrics stream are identical in both modes —
    this scales the reference's ``training()``
    (/root/reference/deepgrp/training.py:15-73) across the mesh.
    """

    def __init__(self, model: DeepGRPModel, options: Options,
                 logdir: os.PathLike, tensorboard: bool = True,
                 mesh=None, rnn_kernel: str = "auto"):
        self.model = model
        self.options = options
        self.logdir = logdir
        self.optimizer = get_optimizer(options)
        self.checkpoints = CheckpointManager(logdir)
        self.writer = MetricsWriter(logdir, tensorboard=tensorboard)
        self.mesh = mesh
        self.fused = self._resolve_train_kernel(rnn_kernel)

    def _resolve_train_kernel(self, mode: str) -> bool:
        """Whether the optimization step uses the fused Pallas train
        kernels (models/pallas_rnn_train.py).

        ``"auto"`` picks fused on TPU for BOTH cells — single-device AND
        the data-parallel mesh step (GRU measured 1.64x at the flagship
        shape, benchmarks/train_kernel_bench.json; each device runs the
        kernel on its local batch slice inside ``shard_map``,
        loss-trajectory equality vs the scan is pinned by
        tests/test_training.py + tests/test_dp_training.py).  Non-TPU
        backends keep the scan (interpreter-mode Pallas is orders of
        magnitude slower).
        """
        if mode == "scan":
            return False
        if mode == "fused":
            return True
        if mode != "auto":
            raise ValueError(
                f"rnn_kernel must be auto|scan|fused, got {mode!r}")
        return jax.default_backend() == "tpu"

    def fit(self, train_data: Data, val_data: Data, params=None,
            seed: int = 0,
            callbacks: Optional[List[MetricCallback]] = None,
            resume: bool = False,
            stop_on_nan: bool = True
            ) -> Tuple[Any, Dict[str, List[float]]]:
        """Run the full training loop; returns (best_params, history).

        ``resume=True`` restarts from the latest checkpoint in ``logdir``
        if one exists (optimizer state starts fresh, like the reference's
        restore-weights workflow, prediction.py:81-86).  ``stop_on_nan``
        aborts the epoch loop on a non-finite training loss and restores
        the best weights (failure containment; the reference only catches
        this at HPO level, optimization.py:99-101).
        """
        options = self.options
        model = self.model
        key = jax.random.PRNGKey(seed)
        if params is None and resume:
            latest = self.checkpoints.latest_path()
            if latest is not None:
                from deepgrp_tpu.train.checkpoint import load_params
                params = load_params(latest)
                _LOG.info("resumed parameters from %s", latest)
        if params is None:
            key, init_key = jax.random.split(key)
            params = model.init(init_key)
        opt_state = self.optimizer.init(params)

        train_sampler = BatchSampler(options, train_data)
        val_sampler = BatchSampler(options, val_data)
        sampler_static = (train_sampler.n_sampled_classes,
                          train_sampler.one_class_size,
                          train_sampler.batch_size, train_sampler.seq_len)

        dp_epoch = None
        if self.mesh is not None:
            from deepgrp_tpu.parallel.mesh import DATA_AXIS
            if self.mesh.shape[DATA_AXIS] > 1:
                from deepgrp_tpu.parallel.train import make_dp_train_epoch
                dp_epoch = make_dp_train_epoch(model, self.optimizer,
                                               self.mesh, options,
                                               train_sampler,
                                               options.n_batches,
                                               fused=self.fused)
                _LOG.info("data-parallel training over %d devices%s",
                          self.mesh.shape[DATA_AXIS],
                          " (fused kernels)" if self.fused else "")

        fwd_buf = train_sampler._fwd
        if self.fused:
            # Fused train kernels consume compact codes (5x less HBM and
            # an exact in-kernel row-select input projection) — both the
            # single-device scan and the DP shard_map step.
            fwd_buf = codes_from_onehot_rows(train_sampler._fwd)

        dp_arrays = None
        if dp_epoch is not None:
            # Explicit replicated placement over the (possibly
            # multi-process) global mesh: jit can re-shard local arrays
            # automatically on one process, but a multi-host run must
            # build the global replicated arrays from the (identical)
            # host copies on every process — same contract as the
            # sharded prediction engine's device_put placement.
            from jax.sharding import NamedSharding, PartitionSpec

            replicated = NamedSharding(self.mesh, PartitionSpec())

            def _rep(a):
                return jax.device_put(np.asarray(a), replicated)

            dp_arrays = (_rep(fwd_buf), _rep(train_sampler._lbl),
                         _rep(train_sampler._candidates),
                         _rep(train_sampler._lengths))
            params = _rep_tree(params, replicated)
            opt_state = _rep_tree(opt_state, replicated)

        def run_epoch(params, opt_state, key):
            """One dispatch per epoch: n_batches steps scanned on device."""
            if dp_epoch is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                key = jax.device_put(
                    np.asarray(key),
                    NamedSharding(self.mesh, PartitionSpec()))
                params, opt_state, key, losses = dp_epoch(
                    params, opt_state, key, *dp_arrays)
                # Host-side key chain: later eager PRNG ops (validation
                # batch) must not mix a mesh-global key with local
                # arrays on a multi-host run.
                return params, opt_state, jnp.asarray(jax.device_get(key)), \
                    losses
            return _train_epoch(params, opt_state, key,
                                fwd_buf, train_sampler._lbl,
                                train_sampler._candidates,
                                train_sampler._lengths, sampler_static,
                                model, self.optimizer, options.vecsize,
                                options.n_batches, fused=self.fused)

        history: Dict[str, List[float]] = {"loss": [], "val_loss": []}
        best_val = np.inf
        best_params = jax.device_get(params)
        patience = 0

        for epoch in range(1, options.n_epochs + 1):
            epoch_t0 = time.time()
            params, opt_state, key, losses = run_epoch(params, opt_state,
                                                       key)
            # device_get first: a replicated global array's mean must be
            # taken on host on multi-host runs.
            train_loss = float(np.mean(jax.device_get(losses)))

            if stop_on_nan and not np.isfinite(train_loss):
                _LOG.warning(
                    "non-finite training loss at epoch %d; stopping and "
                    "restoring best weights", epoch)
                break

            key, val_key = jax.random.split(key)
            val_x, val_y = val_sampler.batch(val_key)
            if dp_epoch is not None:
                # Uncommit the locally-sampled batch so the jit follows
                # the mesh-global params' sharding on multi-host runs.
                val_x = np.asarray(val_x)
                val_y = np.asarray(val_y)
            val_loss = float(_eval_step(params, val_x, val_y, model))

            history["loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            metrics = {"loss": train_loss, "val_loss": val_loss,
                       "epoch_seconds": time.time() - epoch_t0}
            self.writer.write(epoch, metrics)
            for callback in callbacks or []:
                callback(epoch, metrics)
            _LOG.info("epoch %d: loss=%.5f val_loss=%.5f", epoch, train_loss,
                      val_loss)

            if val_loss < best_val:
                best_val = val_loss
                best_params = jax.device_get(params)
                self.checkpoints.save(epoch, best_params)
                patience = 0
            else:
                patience += 1
                if patience >= options.early_stopping_th:
                    _LOG.info("early stopping at epoch %d", epoch)
                    break

        # EarlyStopping(restore_best_weights=True) semantics.
        return best_params, history


def training(data: Tuple[Data, Data], options: Options,
             model: Optional[DeepGRPModel] = None,
             logdir: os.PathLike = ".",
             extra_callbacks: Optional[List[MetricCallback]] = None,
             params=None, seed: int = 0, mesh=None,
             tensorboard: bool = True, rnn_kernel: str = "auto"):
    """Functional API mirroring the reference ``training()``
    (training.py:15-73).  Returns ``(best_params, history)``.

    ``mesh``: optional ``jax.sharding.Mesh`` for data-parallel training.
    ``tensorboard`` (default on, reference parity: the TensorBoard
    callback always runs, training.py:40-45) mirrors metrics into TB
    event files next to ``metrics.jsonl``.  ``rnn_kernel`` selects the
    optimization step's recurrence implementation (auto|scan|fused).
    """
    if model is None:
        model = create_model(options)
    trainer = Trainer(model, options, logdir, mesh=mesh,
                      tensorboard=tensorboard, rnn_kernel=rnn_kernel)
    try:
        return trainer.fit(data[0], data[1], params=params, seed=seed,
                           callbacks=extra_callbacks)
    finally:
        trainer.writer.close()
