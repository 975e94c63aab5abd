"""Smoke tests for the example scripts (notebook equivalents)."""

import csv
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def tiny_dataset(tmp_path):
    rng = np.random.default_rng(0)
    length = 1200
    codes = rng.integers(0, 4, size=length)
    bed_lines = []
    for chrom in ("chrT", "chrV"):
        for start in range(100, length - 100, 300):
            bed_lines.append(f"{chrom} {start} {start + 60} 1")
    for start in range(100, length - 100, 300):
        codes[start:start + 60] = 0
    fwd = np.zeros((5, length), dtype=np.int8)
    fwd[codes, np.arange(length)] = 1
    np.savez_compressed(tmp_path / "chrT.train", fwd=fwd)
    np.savez_compressed(tmp_path / "chrV.val", fwd=fwd)
    (tmp_path / "anno.bed").write_text("\n".join(bed_lines) + "\n")
    config = tmp_path / "tiny.toml"
    config.write_text(
        "vecsize = 20\nunits = 4\nn_epochs = 2\nn_batches = 2\n"
        "batch_size = 8\nearly_stopping_th = 3\ndropout = 0.0\n"
        "repeats_to_search = [ 1, 2,]\n")
    return tmp_path


def run_example(script, args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        cwd=cwd, env=dict(env, PYTHONPATH=REPO), capture_output=True,
        text=True, timeout=600)


def test_train_and_evaluate_script(tiny_dataset):
    result = run_example(
        "train_and_evaluate.py",
        [str(tiny_dataset / "chrT.train.npz"),
         str(tiny_dataset / "chrV.val.npz"),
         str(tiny_dataset / "anno.bed"),
         "--runs", "1", "--outdir", str(tiny_dataset / "out"),
         "--config", str(tiny_dataset / "tiny.toml")],
        cwd=str(tiny_dataset))
    assert result.returncode == 0, result.stdout + result.stderr
    with open(tiny_dataset / "out" / "training_times.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    assert float(rows[0]["seconds"]) > 0
    assert os.path.exists(tiny_dataset / "out" / "model00.npz")


def test_hpo_sweep_script(tiny_dataset):
    result = run_example(
        "hpo_sweep.py",
        [str(tiny_dataset / "chrT.train.npz"),
         str(tiny_dataset / "chrV.val.npz"),
         str(tiny_dataset / "anno.bed"),
         "--trials", "2", "--save-step", "1", "--space", "quick",
         "--config", str(tiny_dataset / "tiny.toml"),
         "--step-size", "10",
         "--root", str(tiny_dataset / "sweep")],
        cwd=str(tiny_dataset))
    assert result.returncode == 0, result.stdout + result.stderr
    assert os.path.exists(tiny_dataset / "sweep" / "results.pkl")
