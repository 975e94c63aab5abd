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
