"""Options / config parity tests (reference: deepgrp/model.py:28-199)."""

import io

import pytest

from deepgrp_tpu.config import Options, create_logdir, dumps_toml

REFERENCE_DEFAULTS = {
    "project_root_dir": ".",
    "repeats_to_search": [1, 2, 3, 4],
    "vecsize": 150,
    "n_epochs": 200,
    "n_batches": 250,
    "early_stopping_th": 10,
    "batch_size": 256,
    "repeat_probability": 0.3,
    "optimizer": "RMSprop",
    "learning_rate": 0.001,
    "momentum": 0.9,
    "rho": 0.9,
    "epsilon": 1e-10,
    "rnn": "GRU",
    "units": 32,
    "dropout": 0.25,
    "attention": False,
    "min_mss_len": 50,
    "xdrop_len": 50,
}


def test_defaults_match_reference():
    assert Options().todict() == REFERENCE_DEFAULTS


def test_kwargs_override_and_extra_attrs():
    opt = Options(vecsize=342, custom_thing="x")
    assert opt.vecsize == 342
    assert opt.custom_thing == "x"


def test_legacy_gru_aliases():
    opt = Options(gru_units=60, gru_dropout=0.1)
    assert opt.units == 60
    assert opt.dropout == pytest.approx(0.1)
    assert "gru_units" not in opt.todict()
    opt["gru_units"] = 7
    assert opt.units == 7
    assert opt["gru_units"] == 7  # read through the alias too


def test_fromdict_roundtrip():
    opt = Options()
    other = Options(vecsize=99, units=11)
    opt.fromdict(other.todict())
    assert opt == other


def test_toml_roundtrip(tmp_path):
    opt = Options(vecsize=342, units=60, attention=True,
                  learning_rate=3.79e-3)
    buf = io.StringIO()
    opt.to_toml(buf)
    restored = Options.from_toml(io.StringIO(buf.getvalue()))
    assert restored == opt


def test_reads_reference_defaults_toml():
    with open("/root/reference/defaults.toml") as file:
        opt = Options.from_toml(file)
    assert opt.vecsize == 342
    assert opt.units == 60
    assert opt.attention is True
    assert opt.rnn == "GRU"


def test_dumps_toml_types():
    text = dumps_toml({"a": 1, "b": 2.5, "c": "x", "d": True,
                       "e": [1, 2, 3]})
    import tomllib
    back = tomllib.loads(text)
    assert back == {"a": 1, "b": 2.5, "c": "x", "d": True, "e": [1, 2, 3]}


def test_create_logdir_scheme(tmp_path):
    opt = Options(project_root_dir=str(tmp_path))
    logdir = create_logdir(opt)
    assert logdir.startswith(str(tmp_path))
    assert "/tf_logs/run-" in logdir
    stamp = logdir.rsplit("run-", 1)[1]
    assert len(stamp) == 14 and stamp.isdigit()
