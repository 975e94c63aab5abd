"""Model file IO: reference Keras HDF5 import and the native .npz format.

``load_keras_h5`` reads models saved by the reference's ``model.save(...)``
(TF2 Keras whole-model HDF5, ``/root/reference/deepgrp/__main__.py:349-351``)
into this framework's parameter pytree — the weight layouts map 1:1 because
the recurrences reproduce Keras numerics (see models/rnn.py).  The CLI
accepts either format, so reference-trained models run unchanged
(``__main__.py:264-270`` behavior, including taking ``vecsize`` from the
model input shape).

The native format is a single ``.npz`` with the flattened parameters plus a
JSON ``__config__`` entry.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np

from deepgrp_tpu.models.model import ModelConfig
from deepgrp_tpu.train.checkpoint import _flatten, _unflatten

Params = Dict[str, Any]

_CONFIG_KEY = "__config__"


def save_model_npz(path: str, config: ModelConfig, params: Params) -> None:
    """Write a self-contained model file (params + architecture config)."""
    flat = _flatten(params)
    flat[_CONFIG_KEY] = np.frombuffer(
        json.dumps(config.__dict__).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_model_npz(path: str) -> Tuple[ModelConfig, Params]:
    with np.load(path) as data:
        flat = {key: data[key] for key in data.files}
    raw = flat.pop(_CONFIG_KEY).tobytes().decode()
    config = ModelConfig(**json.loads(raw))
    return config, _unflatten(flat)


def _collect_weights(h5group) -> Dict[str, np.ndarray]:
    """Flatten every dataset under a group, keyed by its full h5 path."""
    out: Dict[str, np.ndarray] = {}

    def visit(name, obj):
        if hasattr(obj, "shape") and obj.shape is not None:
            out[name] = np.asarray(obj)

    h5group.visititems(visit)
    return out


def _layer_configs(model_config: dict) -> Dict[str, dict]:
    layers = model_config.get("config", {}).get("layers", [])
    return {layer["class_name"]: layer for layer in layers}


def load_keras_h5(path: str) -> Tuple[ModelConfig, Params]:
    """Import a reference Keras HDF5 model.

    Supports the architectures the reference can build (model.py:293-336):
    GRU or LSTM, with or without attention.
    """
    import h5py

    with h5py.File(path, "r") as f:
        raw_config = f.attrs.get("model_config")
        if raw_config is None:
            raise ValueError(f"{path}: not a Keras whole-model HDF5 file")
        if isinstance(raw_config, bytes):
            raw_config = raw_config.decode()
        model_config = json.loads(raw_config)
        weights = _collect_weights(f["model_weights"])

    by_class = _layer_configs(model_config)
    rnn_type = "LSTM" if "LSTM" in by_class else "GRU"
    rnn_cfg = by_class[rnn_type]["config"]
    units = int(rnn_cfg["units"])
    dropout = float(rnn_cfg.get("dropout", 0.0))
    attention = "AdditiveAttention" in by_class

    input_layer = by_class.get("InputLayer", {}).get("config", {})
    shape = input_layer.get("batch_input_shape") or input_layer.get(
        "batch_shape")
    vecsize = int(shape[1]) if shape else 0

    def find(*fragments: str) -> np.ndarray:
        for name, value in weights.items():
            if all(fragment in name for fragment in fragments):
                return value
        raise KeyError(f"no weight matching {fragments} in {path}")

    rnn_layer = "BLSTM" if rnn_type == "LSTM" else "BGRU"
    params: Params = {
        "rnn": {
            "kernel": find(rnn_layer, "/kernel"),
            "recurrent": find(rnn_layer, "recurrent_kernel"),
            "bias": find(rnn_layer, "bias"),
        },
        "dense": {
            "kernel": find("FF", "kernel"),
            "bias": find("FF", "bias"),
        },
    }
    if attention:
        params["attention"] = {"scale": find("additive_attention", "scale")}

    n_classes = int(params["dense"]["bias"].shape[0])
    config = ModelConfig(vecsize=vecsize, units=units, rnn=rnn_type,
                         attention=attention, n_classes=n_classes,
                         dropout=dropout)
    _validate_shapes(config, params)
    return config, params


def _validate_shapes(config: ModelConfig, params: Params) -> None:
    units = config.units
    gates = 4 if config.rnn == "LSTM" else 3
    kernel = params["rnn"]["kernel"]
    recurrent = params["rnn"]["recurrent"]
    if kernel.shape != (config.input_dim, gates * units):
        raise ValueError(f"bad RNN kernel shape {kernel.shape}")
    if recurrent.shape != (units, gates * units):
        raise ValueError(f"bad recurrent kernel shape {recurrent.shape}")
    dense_in = params["dense"]["kernel"].shape[0]
    if dense_in != config.feature_dim:
        raise ValueError(
            f"dense kernel expects {dense_in} features, model config "
            f"produces {config.feature_dim}")


def save_model_h5(path: str, config: ModelConfig, params: Params) -> None:
    """Export to the reference's whole-model Keras HDF5 format.

    The reference loads models with ``tf.keras.models.load_model(path,
    custom_objects={"ReverseComplement": ...})`` and takes ``vecsize``
    from the input shape (``/root/reference/deepgrp/__main__.py:264-270``),
    so the export builds the exact reference architecture
    (``model.py:293-336``: shared-weight fwd/revcomp RNN, optional
    additive attention, Dense logits + Softmax) as a tf_keras graph with
    the reference's layer names and writes this framework's parameters
    into it.  Round-trip: ``load_keras_h5(save_model_h5(c, p)) == (c, p)``.

    Requires ``tf_keras`` (or a TF2 ``tf.keras``); raises ImportError
    otherwise — the native ``.npz`` format needs neither.
    """
    try:
        import tf_keras as keras
    except ImportError:  # pragma: no cover - environment dependent
        from tensorflow import keras  # type: ignore[no-redef]

    complements = [3, 2, 1, 0, 4]  # A<->T, C<->G, N<->N (model.py:233-237)

    class ReverseComplement(keras.layers.Layer):
        """Serialization-compatible twin of the reference custom layer
        (same class name + ``complements`` config key, model.py:240-290),
        so the reference's ``custom_objects`` load accepts the file."""

        def __init__(self, complements, **kwargs):
            super().__init__(**kwargs)
            self._indices = complements

        def call(self, inputs):
            import tensorflow as tf

            return tf.gather(tf.reverse(inputs, axis=[1]), self._indices,
                             axis=2)

        def get_config(self):
            base = super().get_config()
            return {**base, "complements": self._indices}

    inputs = keras.layers.Input((config.vecsize, config.input_dim))
    revcomp = ReverseComplement(complements)(inputs)
    if config.rnn == "LSTM":
        rnn = keras.layers.LSTM(units=config.units, dropout=config.dropout,
                                name="BLSTM", return_sequences=True)
    else:
        rnn = keras.layers.GRU(units=config.units, dropout=config.dropout,
                               name="BGRU", return_sequences=True,
                               return_state=config.attention)
    if config.use_attention:
        fwd, hidden_fwd = rnn(inputs)
        rev, hidden_rev = rnn(revcomp)
        hidden = keras.layers.Average()([hidden_fwd, hidden_rev])
        avg = keras.layers.Average()([fwd, rev])
        hidden = keras.layers.Reshape((1, config.units))(hidden)
        att = keras.layers.AdditiveAttention(
            name="additive_attention")([hidden, avg])
        att = keras.layers.Flatten()(att)
        att = keras.layers.RepeatVector(config.vecsize)(att)
        feats = keras.layers.Concatenate()([att, avg])
    else:
        fwd = rnn(inputs)
        rev = rnn(revcomp)
        feats = keras.layers.Average()([fwd, rev])
    logits = keras.layers.Dense(config.n_classes, name="FF",
                                activation=None)(feats)
    output = keras.layers.Softmax(axis=2)(logits)
    model = keras.Model(inputs=inputs, outputs=output)

    def to_np(a):
        return np.asarray(a, dtype=np.float32)

    rnn_weights = [to_np(params["rnn"]["kernel"]),
                   to_np(params["rnn"]["recurrent"])]
    bias = to_np(params["rnn"]["bias"])
    rnn_weights.append(bias)
    model.get_layer("BLSTM" if config.rnn == "LSTM" else "BGRU"
                    ).set_weights(rnn_weights)
    model.get_layer("FF").set_weights([
        to_np(params["dense"]["kernel"]), to_np(params["dense"]["bias"])])
    if config.use_attention:
        model.get_layer("additive_attention").set_weights(
            [to_np(params["attention"]["scale"])])
    model.save(path, save_format="h5")


def load_model(path: str) -> Tuple[ModelConfig, Params]:
    """Load either a native .npz model or a reference Keras HDF5 model."""
    if path.endswith((".h5", ".hdf5")):
        return load_keras_h5(path)
    if path.endswith(".npz"):
        return load_model_npz(path)
    # Sniff: HDF5 files start with \x89HDF
    with open(path, "rb") as file:
        magic = file.read(8)
    if magic.startswith(b"\x89HDF"):
        return load_keras_h5(path)
    return load_model_npz(path)
