#!/usr/bin/env python3
"""Two-process ``jax.distributed`` simulation of a multi-host pod (CPU).

Proves the multi-host path end to end without TPU pod hardware: N worker
processes each own 2 virtual CPU devices, initialize the distributed
runtime against a local coordinator (``initialize_distributed`` — which
RAISES on failure rather than degrading to single-host), build ONE global
mesh over all ``N*2`` devices, and run the sharded window-stream engine on
the same sequence.  The cross-process spill hand-off rides the same
``ppermute`` collective as on ICI; every process receives the complete
result via the all-gather fetch (``parallel/predict._fetch``).

The launcher (no ``--worker`` flag) spawns the workers, runs the
single-process reference engine itself, and exits non-zero unless every
worker's output is BIT-IDENTICAL to the single-process result.

Usage:
    python examples/multihost_sim.py [--nproc 2] [--seq-len 20000]

Reference scaled here: the window merge loop of
``/root/reference/deepgrp/prediction.py:89-111`` (single-process) — the
north-star config "windows/s at N>=2 hosts" (BASELINE.json).
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

DEVICES_PER_PROC = 2
VECSIZE = 150
STEP = 50
BATCH = 64


def build_inputs():
    import numpy as np

    rng = np.random.default_rng(7)
    return rng.integers(0, 5, size=20000).astype(np.int8)


def build_model_params():
    import jax

    from deepgrp_tpu.models.model import DeepGRPModel, ModelConfig

    config = ModelConfig(vecsize=VECSIZE, units=16, rnn="GRU",
                         attention=True)
    model = DeepGRPModel(config)
    params = model.init(jax.random.PRNGKey(3))
    return model, params


def _force_cpu() -> None:
    # Must run before backend initialization.  A plain env var is not
    # enough when a sitecustomize has already called
    # ``jax.config.update("jax_platforms", ...)`` (config beats env), so
    # force the config value too.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count="
            f"{DEVICES_PER_PROC}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def reference(seq_len: int, outdir: str) -> None:
    """Single-process reference output (run as a CPU subprocess)."""
    _force_cpu()
    import numpy as np

    from deepgrp_tpu.predict.engine import PredictionEngine

    codes = build_inputs()[:seq_len]
    model, params = build_model_params()
    engine = PredictionEngine(model, batch_size=BATCH, step_size=STEP)
    classes, maxp = engine.predict_scored(params, codes)
    np.savez(os.path.join(outdir, "ref.npz"), classes=classes, maxp=maxp)


def worker(proc_id: int, nproc: int, port: int, seq_len: int,
           outdir: str) -> None:
    _force_cpu()
    import numpy as np

    from deepgrp_tpu.parallel import ShardedPredictionEngine, make_mesh
    from deepgrp_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=proc_id,
        initialization_timeout=60,
    )
    import jax

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * DEVICES_PER_PROC

    codes = build_inputs()[:seq_len]
    model, params = build_model_params()
    mesh = make_mesh()  # global mesh over every process's devices
    engine = ShardedPredictionEngine(model, mesh, batch_size=BATCH,
                                     step_size=STEP)
    classes, maxp = engine.predict_scored(params, codes)
    np.savez(os.path.join(outdir, f"proc{proc_id}.npz"),
             classes=classes, maxp=maxp)


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        return sock.getsockname()[1]


def launcher(nproc: int, seq_len: int) -> int:
    import numpy as np

    port = _free_port()
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count="
                         f"{DEVICES_PER_PROC}")
    with tempfile.TemporaryDirectory() as outdir:
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", str(i), "--nproc", str(nproc),
                 "--port", str(port), "--seq-len", str(seq_len),
                 "--outdir", outdir],
                env=env)
            for i in range(nproc)
        ]
        # Single-process reference, also on the CPU backend.
        ref = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--ref",
             "--seq-len", str(seq_len), "--outdir", outdir], env=env)
        rcs = [p.wait(timeout=600) for p in procs] + [ref.wait(timeout=600)]
        if any(rcs):
            print(f"FAIL: worker exit codes {rcs}")
            return 1

        want = np.load(os.path.join(outdir, "ref.npz"))
        for i in range(nproc):
            got = np.load(os.path.join(outdir, f"proc{i}.npz"))
            if not (np.array_equal(got["classes"], want["classes"])
                    and np.array_equal(got["maxp"], want["maxp"])):
                print(f"FAIL: proc {i} output differs from single-process")
                return 1
    print(f"OK: {nproc} processes x {DEVICES_PER_PROC} devices, "
          "bit-identical to single-process")
    return 0


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--nproc", type=int, default=2)
    parser.add_argument("--seq-len", type=int, default=20000)
    parser.add_argument("--worker", type=int, default=None)
    parser.add_argument("--ref", action="store_true")
    parser.add_argument("--port", type=int, default=None)
    parser.add_argument("--outdir", type=str, default=None)
    args = parser.parse_args()
    if args.ref:
        reference(args.seq_len, args.outdir)
        return 0
    if args.worker is not None:
        worker(args.worker, args.nproc, args.port, args.seq_len, args.outdir)
        return 0
    return launcher(args.nproc, args.seq_len)


if __name__ == "__main__":
    sys.exit(main())
