"""Keras HDF5 export: the last interop direction.

``save_model_h5`` must produce a file that (a) round-trips through this
framework's own importer bit-exactly, and (b) the REFERENCE tooling can
consume: ``tf.keras.models.load_model(path, custom_objects=
{"ReverseComplement": ...})`` with ``vecsize`` read off the input shape
(``/root/reference/deepgrp/__main__.py:264-270``).
"""

import numpy as np
import pytest

import jax

from deepgrp_tpu.models.keras_io import (load_keras_h5, load_model,
                                         save_model_h5)
from deepgrp_tpu.models.model import DeepGRPModel, ModelConfig

tf_keras = pytest.importorskip("tf_keras")

ARCHS = [("GRU", True), ("GRU", False), ("LSTM", False)]


def make(rnn, attention, seed=0):
    config = ModelConfig(vecsize=60, units=8, rnn=rnn, attention=attention)
    model = DeepGRPModel(config)
    params = jax.device_get(model.init(jax.random.PRNGKey(seed)))
    return config, model, params


@pytest.mark.parametrize("rnn,attention", ARCHS)
def test_h5_roundtrip_bitwise(rnn, attention, tmp_path):
    config, _, params = make(rnn, attention)
    path = str(tmp_path / "model.h5")
    save_model_h5(path, config, params)
    config2, params2 = load_keras_h5(path)
    assert config2 == config
    jax.tree.map(np.testing.assert_array_equal, params, params2)
    # load_model dispatches on extension too.
    config3, _ = load_model(path)
    assert config3 == config


@pytest.mark.slow
def test_reference_can_consume_export(tmp_path):
    """Load exactly as the reference does and compare predictions."""
    import tensorflow as tf

    config, model, params = make("GRU", True)
    path = str(tmp_path / "model.h5")
    save_model_h5(path, config, params)

    class ReverseComplement(tf_keras.layers.Layer):
        # Stand-in with the reference class's signature/config
        # (model.py:240-290) — what a reference user passes in
        # custom_objects.
        def __init__(self, complements, **kwargs):
            super().__init__(**kwargs)
            self._indices = complements

        def call(self, inputs):
            return tf.gather(tf.reverse(inputs, axis=[1]), self._indices,
                             axis=2)

        def get_config(self):
            return {**super().get_config(), "complements": self._indices}

    loaded = tf_keras.models.load_model(
        path, compile=False,
        custom_objects={"ReverseComplement": ReverseComplement})
    assert loaded.input_shape[1] == config.vecsize

    rng = np.random.default_rng(0)
    x = np.eye(5, dtype=np.float32)[rng.integers(0, 5, size=(8, 60))]
    theirs = loaded.predict_on_batch(x)
    ours = np.asarray(model.apply(jax.device_put(params), x))
    np.testing.assert_allclose(theirs, ours, atol=5e-6)
