"""Sampler and training loop tests."""

import numpy as np
import pytest

import jax

from deepgrp_tpu.config import Options
from deepgrp_tpu.data.preprocess import Data
from deepgrp_tpu.models import create_model
from deepgrp_tpu.train import (BatchSampler, CheckpointManager, calc_indices,
                               get_optimizer, training)


def make_data(length=2000, vecsize=20, seed=0):
    """Synthetic learnable data: class-1 regions are poly-A runs, class-2
    regions are poly-C runs, background is random."""
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=length)
    truelbl = np.zeros((3, length), dtype=np.int8)
    for start in range(100, length - 200, 400):
        codes[start:start + 100] = 0  # poly-A
        truelbl[1, start:start + 100] = 1
        codes[start + 200:start + 260] = 1  # poly-C
        truelbl[2, start + 200:start + 260] = 1
    truelbl[0] = truelbl[1:].sum(axis=0) == 0
    fwd = np.zeros((5, length), dtype=np.int8)
    fwd[codes, np.arange(length)] = 1
    return Data(fwd=fwd, truelbl=truelbl)


def test_calc_indices_reference_semantics():
    # reference: sums = cumsum; rolling window; starts = where>0 - vecsize,
    # then filtered to > 0
    array = np.zeros(100, dtype=np.int8)
    array[50:60] = 1
    idx = calc_indices(array, 10)
    # windows [s, s+10) overlapping [50,60): s in 41..59, minus vecsize
    # offset trick of the reference
    assert idx.min() > 0
    assert 50 in idx
    # reference quirk: indices are where(sums>0) - vecsize; the rolling
    # window [i-9..i] overlaps [50,60) for i in 50..68, so idx = 40..58
    np.testing.assert_array_equal(idx, np.arange(40, 59))


def test_sampler_class_balance():
    options = Options(vecsize=20, batch_size=32, repeat_probability=0.4,
                      repeats_to_search=[1, 2])
    data = make_data()
    sampler = BatchSampler(options, data)
    assert sampler.one_class_size == int(32 * 0.4 / 2)  # 6
    assert sampler.n_sampled_classes == 2

    key = jax.random.PRNGKey(0)
    counts = np.zeros(3)
    n_batches = 50
    for i in range(n_batches):
        starts = np.asarray(sampler.sample_starts(
            jax.random.fold_in(key, i)))
        assert starts.shape == (32,)
        assert starts.min() >= 0
        assert starts.max() < data.fwd.shape[1] - options.vecsize + 20
        for s in starts:
            window = data.truelbl[:, s:s + 20]
            for c in (1, 2):
                if window[c].any():
                    counts[c] += 1
    # each repeat class must appear at least one_class_size times per batch
    # on average (positive windows can also come from the uniform fill)
    assert counts[1] / n_batches >= sampler.one_class_size
    assert counts[2] / n_batches >= sampler.one_class_size


def test_sampler_gather_layout():
    options = Options(vecsize=20, batch_size=8, repeats_to_search=[1, 2])
    data = make_data()
    sampler = BatchSampler(options, data)
    x, y = sampler.batch(jax.random.PRNGKey(1))
    assert x.shape == (8, 20, 5)
    assert y.shape == (8, 20, 3)
    # one-hot columns
    np.testing.assert_allclose(np.asarray(x).sum(-1), np.ones((8, 20)))
    np.testing.assert_allclose(np.asarray(y).sum(-1), np.ones((8, 20)))


def test_sampler_deterministic_with_key():
    options = Options(vecsize=20, batch_size=8, repeats_to_search=[1, 2])
    data = make_data()
    sampler = BatchSampler(options, data)
    a = np.asarray(sampler.sample_starts(jax.random.PRNGKey(5)))
    b = np.asarray(sampler.sample_starts(jax.random.PRNGKey(5)))
    np.testing.assert_array_equal(a, b)


def test_optimizer_mapping():
    import optax
    for name in ("RMSprop", "Adam", "sgd"):
        opt = get_optimizer(Options(optimizer=name))
        assert isinstance(opt, optax.GradientTransformation)
    with pytest.raises(ValueError):
        get_optimizer(Options(optimizer="nope"))


def test_training_loop_learns_and_checkpoints(tmp_path):
    options = Options(vecsize=20, units=8, batch_size=16, n_epochs=4,
                      n_batches=8, early_stopping_th=10, dropout=0.0,
                      repeats_to_search=[1, 2], learning_rate=0.01)
    data = make_data(seed=0)
    val = make_data(seed=1)
    model = create_model(options)
    best_params, history = training((data, val), options, model,
                                    logdir=tmp_path, seed=0)
    assert len(history["loss"]) == 4
    # loss must come down on this easy task
    assert history["loss"][-1] < history["loss"][0]
    # a checkpoint must exist and be loadable
    assert CheckpointManager(tmp_path).latest_path() is not None
    assert (tmp_path / "metrics.jsonl").exists()
    # returned best params match best val epoch checkpoint
    assert best_params is not None


def test_fused_train_kernel_matches_scan(tmp_path):
    """The fused Pallas train step (interpreter mode on CPU) reproduces
    the scan step's loss trajectory: both paths consume the same PRNG
    stream (same window sampling, same per-gate dropout masks), so the
    optimization is numerically the same computation up to matmul
    rounding."""
    options = Options(vecsize=20, units=8, batch_size=8, n_epochs=2,
                      n_batches=2, early_stopping_th=10, dropout=0.15,
                      repeats_to_search=[1, 2], learning_rate=0.01)
    data = make_data(seed=2)
    val = make_data(seed=3)
    model = create_model(options)
    _, hist_scan = training((data, val), options, model,
                            logdir=tmp_path / "scan", seed=0,
                            rnn_kernel="scan")
    _, hist_fused = training((data, val), options, model,
                             logdir=tmp_path / "fused", seed=0,
                             rnn_kernel="fused")
    np.testing.assert_allclose(hist_fused["loss"], hist_scan["loss"],
                               atol=1e-4)
    np.testing.assert_allclose(hist_fused["val_loss"],
                               hist_scan["val_loss"], atol=1e-4)


def test_fused_lstm_train_kernel_matches_scan(tmp_path):
    """LSTM counterpart of the fused-vs-scan trajectory equality: the
    custom-VJP LSTM train kernels consume the same PRNG stream (same
    window sampling, 4 per-gate dropout masks), so the optimization is
    the same computation up to matmul rounding."""
    options = Options(vecsize=20, units=8, batch_size=8, n_epochs=2,
                      n_batches=2, early_stopping_th=10, dropout=0.15,
                      repeats_to_search=[1, 2], learning_rate=0.01,
                      rnn="LSTM", attention=False)
    data = make_data(seed=4)
    val = make_data(seed=5)
    model = create_model(options)
    _, hist_scan = training((data, val), options, model,
                            logdir=tmp_path / "scan", seed=0,
                            rnn_kernel="scan")
    _, hist_fused = training((data, val), options, model,
                             logdir=tmp_path / "fused", seed=0,
                             rnn_kernel="fused")
    np.testing.assert_allclose(hist_fused["loss"], hist_scan["loss"],
                               atol=1e-4)
    np.testing.assert_allclose(hist_fused["val_loss"],
                               hist_scan["val_loss"], atol=1e-4)


def test_trainer_nan_guard(tmp_path):
    from deepgrp_tpu.models import create_model as cm
    from deepgrp_tpu.train.training import Trainer

    options = Options(vecsize=20, units=4, batch_size=8, n_epochs=50,
                      n_batches=2, early_stopping_th=20, dropout=0.0,
                      repeats_to_search=[1, 2], learning_rate=1e6)
    data = make_data(seed=0)
    trainer = Trainer(cm(options), options, tmp_path)
    try:
        _, history = trainer.fit(data, data, stop_on_nan=True)
    finally:
        trainer.writer.close()
    # must abort long before n_epochs once the loss blows up
    assert len(history["loss"]) < 50


def test_trainer_resume_from_checkpoint(tmp_path):
    from deepgrp_tpu.models import create_model as cm
    from deepgrp_tpu.train.checkpoint import load_params
    from deepgrp_tpu.train.training import Trainer

    options = Options(vecsize=20, units=4, batch_size=8, n_epochs=2,
                      n_batches=2, early_stopping_th=5, dropout=0.0,
                      repeats_to_search=[1, 2])
    data = make_data(seed=0)
    trainer = Trainer(cm(options), options, tmp_path)
    try:
        best1, _ = trainer.fit(data, data, seed=0)
    finally:
        trainer.writer.close()

    trainer2 = Trainer(cm(options), options, tmp_path)
    try:
        best2, history2 = trainer2.fit(data, data, seed=1, resume=True)
    finally:
        trainer2.writer.close()
    assert len(history2["loss"]) == 2  # ran again, starting from best1


def test_training_early_stopping(tmp_path):
    options = Options(vecsize=20, units=4, batch_size=8, n_epochs=50,
                      n_batches=2, early_stopping_th=2, dropout=0.0,
                      repeats_to_search=[1, 2],
                      learning_rate=10.0)  # diverges -> early stop
    data = make_data(seed=0)
    model = create_model(options)
    _, history = training((data, data), options, model, logdir=tmp_path)
    assert len(history["loss"]) < 50
