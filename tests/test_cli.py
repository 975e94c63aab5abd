"""End-to-end CLI tests (reference: deepgrp/__main__.py)."""

import gzip
import os

import numpy as np
import pytest

import jax

from deepgrp_tpu import cli
from deepgrp_tpu.config import Options, dumps_toml
from deepgrp_tpu.models import create_model
from deepgrp_tpu.models.keras_io import save_model_npz


@pytest.fixture
def tiny_model_file(tmp_path):
    options = Options(vecsize=25, units=6, attention=True)
    model = create_model(options)
    params = jax.device_get(model.init(jax.random.PRNGKey(0)))
    path = str(tmp_path / "model.npz")
    save_model_npz(path, model.config, params)
    return path


@pytest.fixture
def dummy_fasta(tmp_path):
    rng = np.random.default_rng(0)

    def _make(name="in.fa", n_records=2, length=300):
        path = tmp_path / name
        with open(path, "w") as f:
            for i in range(n_records):
                seq = "".join(rng.choice(list("ACGT"), length))
                f.write(f">record{i}\n")
                for j in range(0, length, 70):
                    f.write(seq[j:j + 70] + "\n")
        return str(path)

    return _make


def test_predict_writes_tsv(tmp_path, tiny_model_file, dummy_fasta):
    fasta_path = dummy_fasta()
    out_path = str(tmp_path / "out.tsv")
    cli.main(["-s", "10", "predict", tiny_model_file, fasta_path,
              "--output", out_path])
    lines = open(out_path).read().splitlines()
    assert lines  # untrained model produces *some* segments
    for line in lines:
        fields = line.split("\t")
        assert len(fields) == 5
        assert fields[0] == fasta_path
        assert fields[1].startswith("record")
        start, end, label = int(fields[2]), int(fields[3]), int(fields[4])
        assert 0 <= start < end <= 300
        assert label > 0


def test_predict_no_mss(tmp_path, tiny_model_file, dummy_fasta):
    fasta_path = dummy_fasta()
    out_path = str(tmp_path / "softmax.tsv")
    cli.main(["-s", "10", "predict", tiny_model_file, fasta_path, "-m",
              "--output", out_path])
    assert (tmp_path / "softmax.tsv").exists()


def test_predict_stdout(capsys, tiny_model_file, dummy_fasta):
    fasta_path = dummy_fasta()
    cli.main(["-s", "10", "predict", tiny_model_file, fasta_path])
    out = capsys.readouterr().out
    assert all(len(l.split("\t")) == 5 for l in out.splitlines())


def test_train_end_to_end(tmp_path):
    length = 1200
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=length)
    # poly-A repeat regions as class 1
    for start in range(100, length - 100, 300):
        codes[start:start + 60] = 0
    fwd = np.zeros((5, length), dtype=np.int8)
    fwd[codes, np.arange(length)] = 1

    np.savez_compressed(tmp_path / "chrT.train", fwd=fwd)
    np.savez_compressed(tmp_path / "chrV.val", fwd=fwd)

    bed_lines = []
    for start in range(100, length - 100, 300):
        bed_lines.append(f"chrT {start} {start + 60} 1")
        bed_lines.append(f"chrV {start} {start + 60} 1")
    bed = tmp_path / "anno.bed"
    bed.write_text("\n".join(bed_lines) + "\n")

    toml_path = tmp_path / "params.toml"
    opts = Options(vecsize=20, units=4, n_epochs=2, n_batches=3,
                   repeats_to_search=[1, 2], early_stopping_th=5,
                   dropout=0.0)
    toml_path.write_text(dumps_toml(opts.todict()))

    modelfile = str(tmp_path / "trained.npz")
    logdir = str(tmp_path / "logs")
    cli.main(["-b", "8", "train", "--honor-toml", str(toml_path),
              str(tmp_path / "chrT.train.npz"), str(tmp_path / "chrV.val.npz"),
              str(bed), "--logdir", logdir, "--modelfile", modelfile])

    from deepgrp_tpu.models.keras_io import load_model_npz
    config, params = load_model_npz(modelfile)
    assert config.vecsize == 20
    assert config.n_classes == 3
    assert (tmp_path / "logs" / "metrics.jsonl").exists()
    # TensorBoard events are on by default (reference parity: the TB
    # callback always runs, training.py:40-45).
    events = [f for f in os.listdir(logdir)
              if f.startswith("events.out.tfevents")]
    assert events, "CLI train run must leave a TB event file in logdir"


def test_cli_default_toml_precedence_quirk(tmp_path):
    """Reference parity: without --honor-toml the CLI Options dict
    overwrites every TOML value (__main__.py:309-311)."""
    toml_path = tmp_path / "params.toml"
    toml_path.write_text("vecsize = 342\nunits = 60\n")
    with open(toml_path) as f:
        parameter = Options.from_toml(f)
    options = cli.options_from_args(
        cli.build_parser().parse_args(["-l", "40", "predict", "x", "y"]))
    parameter.fromdict(options.todict())
    # TOML vecsize clobbered back to the default by the reference precedence
    assert parameter.vecsize == 150
    assert parameter.min_mss_len == 40


def test_predict_mesh_matches_single(tmp_path, tiny_model_file, dummy_fasta):
    import jax as _jax
    if len(_jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    fasta_path = dummy_fasta(name="mesh.fa", n_records=2, length=500)
    single = str(tmp_path / "single.tsv")
    meshed = str(tmp_path / "meshed.tsv")
    cli.main(["-s", "10", "predict", tiny_model_file, fasta_path,
              "--mesh", "off", "--output", single])
    cli.main(["-s", "10", "predict", tiny_model_file, fasta_path,
              "--mesh", "auto", "--output", meshed])
    assert open(single).read() == open(meshed).read()
    assert open(single).read()  # non-empty


def test_cli_no_command_exits(capsys):
    with pytest.raises(SystemExit):
        cli.main([])


def test_threads_prescan_sets_omp(monkeypatch):
    # __main__ pre-scans -t/--threads into OMP_NUM_THREADS before any
    # heavy import so BLAS/OpenMP pools are sized correctly.
    from deepgrp_tpu.__main__ import _prescan_threads

    monkeypatch.delenv("OMP_NUM_THREADS", raising=False)
    _prescan_threads(["-b", "8", "-t", "3", "predict", "m", "f"])
    assert os.environ["OMP_NUM_THREADS"] == "3"
    monkeypatch.setenv("OMP_NUM_THREADS", "7")
    _prescan_threads(["-t", "2"])  # existing value wins
    assert os.environ["OMP_NUM_THREADS"] == "7"
    monkeypatch.delenv("OMP_NUM_THREADS", raising=False)
    _prescan_threads(["--threads=4"])
    assert os.environ["OMP_NUM_THREADS"] == "4"
    monkeypatch.delenv("OMP_NUM_THREADS", raising=False)
    _prescan_threads(["-t", "0"])  # 0 = all threads: leave unset
    assert "OMP_NUM_THREADS" not in os.environ
