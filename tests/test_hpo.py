"""HPO tests: search space, TPE, objective parity, vmapped trials."""

import json
import os
import pickle

import numpy as np
import pytest

from deepgrp_tpu.config import Options
from deepgrp_tpu.data.preprocess import Data
from deepgrp_tpu.hpo import (STATUS_FAIL, STATUS_OK, Trials,
                             build_and_optimize, fmin, run_a_trial)
from deepgrp_tpu.hpo.space import (lognormal, qnormal,
                                   reference_search_space, sample_space,
                                   uniform)
from deepgrp_tpu.hpo.bucketed import run_bucketed_sweep, shape_bucket_key
from deepgrp_tpu.hpo.tpe import suggest
from deepgrp_tpu.hpo.vmapped import run_parallel_trials


def test_space_sampling_distributions():
    rng = np.random.default_rng(0)
    space = reference_search_space()
    for _ in range(50):
        sample = sample_space(space, rng)
        assert 0 <= sample["dropout"] <= 0.4
        assert 0 <= sample["repeat_probability"] <= 0.49
        assert sample["learning_rate"] > 0
        assert sample["vecsize"] % 2 == 0  # q=2
        assert sample["units"] % 2 == 0


def test_latent_roundtrip():
    dim = lognormal("lr", -7, 0.5)
    assert dim.from_latent(dim.to_latent(0.003)) == pytest.approx(0.003)
    qdim = qnormal("vecsize", 200, 20, 2)
    assert qdim.from_latent(201.2) == 202.0
    udim = uniform("x", 0, 1)
    assert udim.from_latent(1.7) == 1.0  # clipped


def test_fmin_minimizes_quadratic():
    space = {"x": uniform("x", -5, 5)}

    def objective(params):
        return {"loss": (params["x"] - 2.0) ** 2, "status": STATUS_OK}

    trials = Trials()
    fmin(objective, space, trials, max_evals=60, seed=0, n_startup=15)
    best = trials.best_trial()
    assert abs(best["params"]["x"] - 2.0) < 0.5
    # TPE should concentrate: late proposals closer to optimum on average
    xs = [t["params"]["x"] for t in trials.trials]
    early = np.mean(np.abs(np.array(xs[:15]) - 2.0))
    late = np.mean(np.abs(np.array(xs[-15:]) - 2.0))
    assert late < early


def test_suggest_ignores_failed_trials():
    space = {"x": uniform("x", -5, 5)}
    trials = Trials()
    for i in range(30):
        trials.record({"x": float(i % 5)}, {"loss": np.inf,
                                            "status": STATUS_FAIL})
    rng = np.random.default_rng(0)
    # all trials failed (inf loss) -> still in random-startup mode
    proposal = suggest(space, trials, rng, n_startup=20)
    assert -5 <= proposal["x"] <= 5


def make_tiny_data(seed=0):
    rng = np.random.default_rng(seed)
    length = 1500
    codes = rng.integers(0, 4, size=length)
    truelbl = np.zeros((3, length), dtype=np.int8)
    for start in range(100, length - 100, 400):
        codes[start:start + 80] = 0
        truelbl[1, start:start + 80] = 1
    truelbl[0] = truelbl[1:].sum(axis=0) == 0
    fwd = np.zeros((5, length), dtype=np.int8)
    fwd[codes, np.arange(length)] = 1
    return Data(fwd=fwd, truelbl=truelbl)


def base_options(tmp_path):
    return Options(vecsize=20, units=4, batch_size=8, n_epochs=2,
                   n_batches=2, early_stopping_th=3, dropout=0.0,
                   repeats_to_search=[1, 2],
                   project_root_dir=str(tmp_path))


def test_build_and_optimize_ok_path(tmp_path):
    options = base_options(tmp_path)
    options.n_epochs = 5
    options.n_batches = 10
    options.batch_size = 16
    result = build_and_optimize(make_tiny_data(0), make_tiny_data(1), 10,
                                options, {"learning_rate": 0.05,
                                          "vecsize": 20.0, "units": 8.0})
    assert result["status"] == STATUS_OK
    assert np.isfinite(result["loss"])
    assert result["Metrics"] is not None
    assert result["options"]["vecsize"] == 20  # int coercion
    assert result["logdir"] is not None
    # Observability parity (reference optimization.py:54,82-88): the trial
    # logdir records the searched hyperparameters and the final MCC.
    with open(os.path.join(result["logdir"], "hparams.json")) as fh:
        hparams = json.load(fh)
    assert hparams["learning_rate"] == 0.05
    assert hparams["units"] == 8.0
    records = [json.loads(line) for line in
               open(os.path.join(result["logdir"], "metrics.jsonl"))]
    mccs = [r["hpo/MCC"] for r in records if "hpo/MCC" in r]
    assert len(mccs) == 1
    assert mccs[0] == pytest.approx(-result["loss"])


def test_evaluate_trained_scored_path_matches_full_matrix(tmp_path):
    """VERDICT r4 item 5: the sweep evaluation path now rides the scored
    transport (classes+maxp) instead of the full probability matrix; the
    resulting metrics must be bit-identical to the legacy
    predict_complete -> apply_mss -> argmax -> filter_segments chain."""
    import jax
    from deepgrp_tpu.hpo.optimization import evaluate_trained
    from deepgrp_tpu.models.model import create_model
    from deepgrp_tpu.ops.segments import filter_segments
    from deepgrp_tpu.predict.metrics import calculate_metrics
    from deepgrp_tpu.predict.postprocess import predict_complete

    options = base_options(tmp_path)
    val = make_tiny_data(5)
    model = create_model(options)
    params = model.init(jax.random.PRNGKey(3))

    got = evaluate_trained(options, 10, tmp_path, val, params)

    predictions = predict_complete(10, options, tmp_path, val,
                                   use_mss=True, params=params)
    is_not_na = np.logical_not(np.isnan(predictions[:, 0]))
    predictions_class = predictions[is_not_na].argmax(axis=1)
    filter_segments(predictions_class, options.min_mss_len)
    _, want = calculate_metrics(
        predictions_class, val.truelbl[:, is_not_na].argmax(axis=0))

    assert set(got) == set(want)
    for key in want:
        # exact equality; NaN entries (undefined rates) must match too
        np.testing.assert_array_equal(np.asarray(got[key]),
                                      np.asarray(want[key]), err_msg=key)


def test_build_and_optimize_failure_path(tmp_path):
    options = base_options(tmp_path)
    # vecsize larger than the sequence -> sampler/training must fail
    result = build_and_optimize(make_tiny_data(0), make_tiny_data(1), 10,
                                options, {"vecsize": 100000})
    assert result["status"] == STATUS_FAIL
    assert result["loss"] == np.inf
    assert result["error"]


def test_run_a_trial_resume(tmp_path):
    space = {"x": uniform("x", 0, 1)}
    calls = []

    def objective(params):
        calls.append(params)
        return {"loss": params["x"], "status": STATUS_OK}

    n = run_a_trial(space, objective, str(tmp_path), 3, seed=0)
    assert n == 3
    # resume adds more trials on top of the pickle
    n = run_a_trial(space, objective, str(tmp_path), 2, seed=1)
    assert n == 5
    with open(tmp_path / "results.pkl", "rb") as f:
        trials = pickle.load(f)
    assert len(trials) == 5


def test_parallel_trials_match_varying_lr(tmp_path):
    options = base_options(tmp_path)
    options.n_epochs = 3
    options.n_batches = 4
    trial_dicts = [{"learning_rate": 0.01}, {"learning_rate": 1e-6}]
    results = run_parallel_trials(options, trial_dicts, make_tiny_data(0),
                                  make_tiny_data(1), seed=0)
    assert len(results) == 2
    for r in results:
        assert np.isfinite(r["val_loss"])
        assert r["params"]["dense"]["kernel"].shape == (4, 3)
    # the near-zero-lr trial should barely learn; the real one should win
    assert results[0]["val_loss"] < results[1]["val_loss"]


def test_parallel_trials_freeze_converged(tmp_path):
    # A frozen (patience-exhausted) trial's updates are masked to zero on
    # device, and the fleet loop exits early once every trial is frozen
    # instead of running to n_epochs.
    import jax
    import jax.numpy as jnp

    from deepgrp_tpu.hpo import vmapped

    options = base_options(tmp_path)
    options.n_epochs = 50  # the early-exit must fire long before this
    options.n_batches = 2
    options.early_stopping_th = 2
    trial_dicts = [{"learning_rate": 0.01}, {"learning_rate": 0.0}]
    results = run_parallel_trials(options, trial_dicts, make_tiny_data(0),
                                  make_tiny_data(1), seed=0)
    # lr=0 never improves after its first epoch -> stops at patience+1;
    # both trials must have stopped well before 50 epochs.
    assert results[1]["stopped_epoch"] <= 1 + options.early_stopping_th
    for r in results:
        assert r["stopped_epoch"] < options.n_epochs
        assert len(r["val_history"]) == max(x["stopped_epoch"]
                                            for x in results)

    # Unit invariant: an inactive trial's params are bit-frozen through a
    # fleet step while the active trial's move.
    from deepgrp_tpu.models.model import create_model
    from deepgrp_tpu.train.sampler import BatchSampler

    model = create_model(options)
    sampler = BatchSampler(options, make_tiny_data(0))
    sampler_static = (sampler.n_sampled_classes, sampler.one_class_size,
                      sampler.batch_size, sampler.seq_len)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    params = jax.vmap(model.init)(keys)
    params_before = jax.device_get(params)
    optimizer = vmapped._injected_optimizer(str(options.optimizer))
    opt_states = jax.vmap(optimizer.init)(params)
    hp = {k: jnp.asarray(v) for k, v in vmapped.stack_trial_hyperparams(
        options, [{}, {}]).items()}
    active = jnp.asarray([True, False])
    params2, _, _ = vmapped._parallel_step(
        params, opt_states, hp, keys, active, sampler._fwd, sampler._lbl,
        sampler._candidates, sampler._lengths, sampler_static, model,
        str(options.optimizer), int(options.vecsize))
    after = jax.device_get(params2)
    for key in ("rnn", "dense"):
        for name, arr in after[key].items():
            np.testing.assert_array_equal(
                arr[1], params_before[key][name][1])  # frozen trial
    assert not np.array_equal(after["dense"]["kernel"][0],
                              params_before["dense"]["kernel"][0])


def test_parallel_trials_reject_shape_keys(tmp_path):
    options = base_options(tmp_path)
    with pytest.raises(ValueError, match="can only vary"):
        run_parallel_trials(options, [{"vecsize": 30}, {"vecsize": 30}],
                            make_tiny_data(0), make_tiny_data(1))


def test_bucketed_sweep_covers_shape_dimensions(tmp_path):
    # The full-space parallel path: vecsize/units/repeat_probability vary
    # across proposals; same-shape trials train under one vmap, and the
    # sweep records every proposal with the serial result schema + resume.
    space = {
        "vecsize": qnormal("vecsize", 20, 3, 2),
        "units": qnormal("units", 6, 2, 2),
        "learning_rate": lognormal("learning_rate", -4, 0.5),
        "dropout": uniform("dropout", 0, 0.2),
        "repeat_probability": uniform("repeat_probability", 0.1, 0.45),
    }
    options = base_options(tmp_path)
    options.n_epochs = 5
    options.n_batches = 8
    options.batch_size = 16
    trials = run_bucketed_sweep(space, options, make_tiny_data(0),
                                make_tiny_data(1), step_size=10,
                                project_root_dir=str(tmp_path),
                                max_evals=5, batch_evals=5, seed=3)
    assert len(trials) == 5
    keys = {shape_bucket_key(options, t["params"]) for t in trials.trials}
    assert len(keys) > 1  # architecture dimensions actually varied
    ok = [t for t in trials.trials if t["result"]["status"] == STATUS_OK]
    assert ok, "no trial succeeded"
    for t in ok:
        assert np.isfinite(t["result"]["loss"])
        assert t["result"]["options"]["vecsize"] == int(
            t["params"]["vecsize"])
        assert os.path.exists(
            os.path.join(t["result"]["logdir"], "hparams.json"))
    # resume: a second call stacks more trials onto the pickle
    trials = run_bucketed_sweep(space, options, make_tiny_data(0),
                                make_tiny_data(1), step_size=10,
                                project_root_dir=str(tmp_path),
                                max_evals=2, batch_evals=2, seed=4)
    assert len(trials) == 7
