"""Multi-host correctness evidence.

``test_multiprocess_predict`` drives the two-process ``jax.distributed``
CPU simulation (examples/multihost_sim.py): two worker processes with two
virtual devices each initialize against a local coordinator, build one
global 4-device mesh, run the sharded engine, and every process's output
must be bit-identical to a single-process run — the north-star "N>=2
hosts" configuration (BASELINE.json) without pod hardware.

``test_initialize_distributed_raises`` pins the failure-is-loud contract:
a real ``jax.distributed.initialize`` error must propagate (the round-2
version swallowed RuntimeError unconditionally, so a bad coordinator
silently degraded to single-host).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIM = os.path.join(REPO, "examples", "multihost_sim.py")


@pytest.mark.slow
def test_multiprocess_predict():
    result = subprocess.run([sys.executable, SIM, "--seq-len", "20000"],
                            capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, result.stdout + result.stderr
    assert "bit-identical to single-process" in result.stdout


_CLI_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from deepgrp_tpu import cli
cli.main(sys.argv[1:])
"""


@pytest.mark.slow
def test_multiprocess_predict_via_cli(tmp_path):
    """The product CLI drives a real N=2-process run end to end.

    Two worker processes (two virtual CPU devices each) join via the
    CLI's --coordinator/--num-processes/--process-id flags, shard the
    window stream over the global 4-device mesh, and process 0's BED
    output must be bitwise identical to the recorded reference BED —
    the north-star "N>=2 hosts" configuration through the launch surface
    a user actually gets (SURVEY §7 step 6).
    """
    import socket

    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        port = sock.getsockname()[1]
    fixdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "fixtures", "reference")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    outs = [str(tmp_path / f"proc{i}.bed") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CLI_WORKER, "-b", "64", "-s", "50",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i),
             "predict", os.path.join(fixdir, "gru.h5"),
             os.path.join(fixdir, "gru.fa"), "--output", outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True) for i in range(2)
    ]
    for proc in procs:
        try:
            _, err = proc.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        assert proc.returncode == 0, err
    got = [line.split("\t", 1)[1]
           for line in open(outs[0]).read().splitlines()]
    want = open(os.path.join(fixdir, "gru.bed")).read().splitlines()
    assert got == want
    # Only process 0 emits the stream.
    assert not os.path.exists(outs[1]) or not open(outs[1]).read()


def _write_train_inputs(tmp_path):
    import numpy as np

    rng = np.random.default_rng(0)
    length = 12000
    codes = rng.integers(0, 4, size=length)
    fwd = np.zeros((5, length), np.int8)
    fwd[codes, np.arange(length)] = 1
    np.savez_compressed(tmp_path / "chrT.fa.gz.npz", fwd=fwd, hash=b"x")
    np.savez_compressed(tmp_path / "chrV.fa.gz.npz", fwd=fwd, hash=b"x")
    rows = []
    for cls in range(1, 5):
        rows.append(f"chrT\t100\t3000\t{cls}\n")
        rows.append(f"chrV\t100\t3000\t{cls}\n")
    (tmp_path / "anno.bed").write_text("".join(rows))
    (tmp_path / "params.toml").write_text(
        "vecsize = 80\nunits = 8\nattention = true\nbatch_size = 32\n"
        "n_epochs = 2\nn_batches = 2\nearly_stopping_th = 5\n")


def _train_cli_args(tmp_path, tag):
    return ["-b", "32", "train", str(tmp_path / "params.toml"),
            str(tmp_path / "chrT.fa.gz.npz"),
            str(tmp_path / "chrV.fa.gz.npz"), str(tmp_path / "anno.bed"),
            "--logdir", str(tmp_path / f"logs_{tag}"),
            "--modelfile", str(tmp_path / f"model_{tag}.npz"),
            "--mesh", "auto", "--honor-toml", "--no-tensorboard"]


@pytest.mark.slow
def test_multiprocess_train_via_cli(tmp_path):
    """Two-process DP training through the CLI == single-process DP.

    Two worker processes (two virtual CPU devices each) join via
    --coordinator and train data-parallel over the global 4-device mesh;
    the per-epoch loss trajectory and the saved model weights must equal
    a single-process run on a 4-device mesh (same global mesh shape ->
    same key chain and the same SPMD program).  VERDICT r4 item 7: the
    multi-host TRAINING path gets the same CLI-driven equality evidence
    the predict path has.
    """
    import json

    import numpy as np

    import socket

    _write_train_inputs(tmp_path)
    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        port = sock.getsockname()[1]

    # Single-process 4-device DP run.
    env1 = dict(os.environ, JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=4")
    res = subprocess.run(
        [sys.executable, "-c", _CLI_WORKER] + _train_cli_args(tmp_path,
                                                              "single"),
        env=env1, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stdout + res.stderr

    # Two processes x two devices -> the same global 4-device mesh.
    env2 = dict(os.environ, JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=2")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CLI_WORKER,
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i)]
            + _train_cli_args(tmp_path, f"proc{i}"),
            env=env2, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True) for i in range(2)
    ]
    for proc in procs:
        try:
            _, err = proc.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        assert proc.returncode == 0, err

    def losses(tag):
        path = tmp_path / f"logs_{tag}" / "metrics.jsonl"
        return [(rec["loss"], rec["val_loss"]) for rec in
                map(json.loads, open(path)) if "loss" in rec]

    want = losses("single")
    assert len(want) == 2  # n_epochs
    np.testing.assert_allclose(losses("proc0"), want, rtol=1e-6)

    from deepgrp_tpu.models.keras_io import load_model

    _, params_single = load_model(str(tmp_path / "model_single.npz"))
    _, params_proc0 = load_model(str(tmp_path / "model_proc0.npz"))
    import jax

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        params_single, params_proc0)


def test_initialize_distributed_raises(monkeypatch):
    import jax

    from deepgrp_tpu.parallel.mesh import initialize_distributed

    def boom(**kwargs):
        raise RuntimeError("bad coordinator")

    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="bad coordinator"):
        initialize_distributed(coordinator_address="127.0.0.1:1")


def test_initialize_distributed_noop_when_initialized(monkeypatch):
    import jax

    from deepgrp_tpu.parallel.mesh import initialize_distributed

    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: (_ for _ in ()).throw(AssertionError("called")))
    initialize_distributed()  # must not call initialize again
