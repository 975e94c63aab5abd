"""Checkpoint and model-file IO tests, incl. the Keras HDF5 importer."""

import json

import numpy as np
import pytest

import jax

from deepgrp_tpu.config import Options
from deepgrp_tpu.models import create_model
from deepgrp_tpu.models import keras_io
from deepgrp_tpu.train import checkpoint


def make_params(seed=0, units=8, attention=True):
    options = Options(vecsize=20, units=units, attention=attention)
    model = create_model(options)
    return model, jax.device_get(model.init(jax.random.PRNGKey(seed)))


def tree_equal(a, b):
    flat_a = checkpoint._flatten(a)
    flat_b = checkpoint._flatten(b)
    assert flat_a.keys() == flat_b.keys()
    for key in flat_a:
        np.testing.assert_array_equal(flat_a[key], flat_b[key])


def test_save_load_roundtrip(tmp_path):
    _, params = make_params()
    path = str(tmp_path / "params.npz")
    checkpoint.save_params(path, params)
    tree_equal(checkpoint.load_params(path), params)


def test_manager_latest_and_pointer(tmp_path):
    _, p1 = make_params(1)
    _, p2 = make_params(2)
    mgr = checkpoint.CheckpointManager(tmp_path)
    mgr.save(1, p1)
    mgr.save(7, p2)
    assert mgr.latest_path().endswith("07.npz")
    tree_equal(checkpoint.latest_checkpoint_params(tmp_path), p2)


def test_manager_no_checkpoint(tmp_path):
    with pytest.raises(FileNotFoundError):
        checkpoint.latest_checkpoint_params(tmp_path)


def test_model_npz_roundtrip(tmp_path):
    model, params = make_params()
    path = str(tmp_path / "model.npz")
    keras_io.save_model_npz(path, model.config, params)
    config, restored = keras_io.load_model_npz(path)
    assert config == model.config
    tree_equal(restored, params)


def _write_fake_keras_h5(path, rnn="GRU", attention=True, vecsize=25,
                         units=6, n_classes=5):
    """Build an HDF5 file with the reference's Keras save layout."""
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(0)
    layers = [
        {"class_name": "InputLayer",
         "config": {"batch_input_shape": [None, vecsize, 5]}},
        {"class_name": "ReverseComplement",
         "config": {"complements": [3, 2, 1, 0, 4]}},
        {"class_name": rnn,
         "config": {"units": units, "dropout": 0.25,
                    "return_sequences": True}},
        {"class_name": "Dense", "config": {"units": n_classes}},
        {"class_name": "Softmax", "config": {"axis": 2}},
    ]
    if attention and rnn == "GRU":
        layers.append({"class_name": "AdditiveAttention",
                       "config": {"use_scale": True}})
    model_config = {"class_name": "Functional", "config": {"layers": layers}}

    gates = 4 if rnn == "LSTM" else 3
    layer = "BLSTM" if rnn == "LSTM" else "BGRU"
    cell = "lstm_cell" if rnn == "LSTM" else "gru_cell"
    feature_dim = 2 * units if (attention and rnn == "GRU") else units
    weights = {
        f"{layer}/{layer}/{cell}/kernel:0":
            rng.normal(size=(5, gates * units)),
        f"{layer}/{layer}/{cell}/recurrent_kernel:0":
            rng.normal(size=(units, gates * units)),
        f"{layer}/{layer}/{cell}/bias:0":
            rng.normal(size=(4 * units,)) if rnn == "LSTM" else
            rng.normal(size=(2, gates * units)),
        "FF/FF/kernel:0": rng.normal(size=(feature_dim, n_classes)),
        "FF/FF/bias:0": rng.normal(size=(n_classes,)),
    }
    if attention and rnn == "GRU":
        weights["additive_attention/additive_attention/scale:0"] = (
            rng.normal(size=(units,)))

    with h5py.File(path, "w") as f:
        f.attrs["model_config"] = json.dumps(model_config)
        grp = f.create_group("model_weights")
        for name, value in weights.items():
            grp.create_dataset(name, data=value.astype(np.float32))
    return weights


@pytest.mark.parametrize("rnn,attention", [("GRU", True), ("GRU", False),
                                           ("LSTM", False)])
def test_keras_h5_import(tmp_path, rnn, attention):
    path = str(tmp_path / "model.h5")
    weights = _write_fake_keras_h5(path, rnn=rnn, attention=attention)
    config, params = keras_io.load_keras_h5(path)
    assert config.vecsize == 25
    assert config.units == 6
    assert config.rnn == rnn
    assert config.use_attention == (attention and rnn == "GRU")
    layer = "BLSTM" if rnn == "LSTM" else "BGRU"
    cell = "lstm_cell" if rnn == "LSTM" else "gru_cell"
    np.testing.assert_array_equal(
        params["rnn"]["kernel"],
        weights[f"{layer}/{layer}/{cell}/kernel:0"].astype(np.float32))

    # imported model must run
    model = create_model(Options(vecsize=config.vecsize, units=config.units,
                                 rnn=config.rnn,
                                 attention=config.attention))
    probs = model.apply(params, jax.numpy.zeros((2, 25, 5)))
    assert probs.shape == (2, 25, 5)


def test_load_model_dispatch(tmp_path):
    model, params = make_params()
    npz_path = str(tmp_path / "model.npz")
    keras_io.save_model_npz(npz_path, model.config, params)
    config, _ = keras_io.load_model(npz_path)
    assert config == model.config

    h5_path = str(tmp_path / "model.hdf5")
    _write_fake_keras_h5(h5_path)
    config, _ = keras_io.load_model(h5_path)
    assert config.rnn == "GRU"
