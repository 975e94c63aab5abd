#!/usr/bin/env python3
"""Benchmark: single-chip windowed inference throughput (windows/sec).

Measures the flagship model (reference defaults.toml: vecsize=342, GRU
units=60, additive attention) scanning a synthetic chromosome with the
production engine, on the default JAX platform (the real TPU chip under the
driver).  The baseline is the reference's TF2-CPU envelope, stood in for by
an equivalent torch-CPU model (same architecture and math; torch's fused
GRU is, if anything, faster than TF2's generic CPU graph executor) run with
the reference Docker envelope's OMP_NUM_THREADS=4
(reference Dockerfile:13-14).  The baseline number is cached in
BENCH_BASELINE.json so repeat runs don't re-measure it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

SEQ_LEN = int(os.environ.get("BENCH_SEQ_LEN", 2_000_000))
STEP = 50
BATCH = int(os.environ.get("BENCH_BATCH", 1024))
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")


def flagship():
    from deepgrp_tpu.config import Options
    from deepgrp_tpu.models import create_model

    options = Options(vecsize=342, units=60, attention=True, dropout=0.0928)
    return options, create_model(options)


def make_sequence(length: int) -> np.ndarray:
    """Random chromosome in the compact code representation (int8 [L])."""
    rng = np.random.default_rng(0)
    return rng.integers(0, 4, size=length).astype(np.int8)


def _enable_compile_cache() -> None:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measure_tpu(codes: np.ndarray) -> float:
    import jax

    _enable_compile_cache()
    from deepgrp_tpu.predict.engine import PredictionEngine, window_starts
    from deepgrp_tpu.predict.postprocess import predict_sequence

    options, model = flagship()
    params = jax.device_put(model.init(jax.random.PRNGKey(0)))
    engine = PredictionEngine(model, batch_size=BATCH, step_size=STEP)

    n_windows = window_starts(codes.shape[-1], options.vecsize, STEP).size

    def run():
        # The full production FASTA->classes path: compact codes
        # host->device, device one-hot expansion + chunk-scan forward +
        # overlap-max merge + device argmax/max, scored arrays
        # device->host, multithreaded C++ Ruzzo-Tompa MSS.  (--device-mss
        # exists for transfer-starved links, but an untrained model's
        # noisy score track has ~L/10 positive runs, which serializes the
        # on-chip candidate scan — the host MT MSS is the fast default.)
        return predict_sequence(model, params, codes, options, STEP,
                                use_mss=True, engine=engine)

    run()  # warmup/compile with the exact static shapes of the timed run
    t0 = time.perf_counter()
    classes = run()
    elapsed = time.perf_counter() - t0
    assert classes.shape[0] == codes.shape[-1]
    return n_windows / elapsed


def measure_torch_cpu_baseline() -> float:
    """Reference-equivalent model in torch on CPU, 4 threads, batch 256."""
    import torch

    torch.set_num_threads(4)
    options, model_desc = flagship()
    units, vecsize = options.units, options.vecsize
    gru = torch.nn.GRU(5, units, batch_first=True)
    dense = torch.nn.Linear(2 * units, 5)
    perm = torch.tensor([3, 2, 1, 0, 4])
    scale = torch.randn(units)

    def forward(x):
        rev = torch.flip(x, dims=[1])[:, :, perm]
        both = torch.cat([x, rev], dim=0)
        seq, last = gru(both)
        b = x.shape[0]
        avg = (seq[:b] + seq[b:]) * 0.5
        hidden = (last[0, :b] + last[0, b:]) * 0.5
        scores = (scale * torch.tanh(hidden[:, None, :] + avg)).sum(-1)
        weights = torch.softmax(scores, dim=-1)
        att = torch.einsum("bt,btu->bu", weights, avg)
        feats = torch.cat(
            [att[:, None, :].expand(-1, vecsize, -1), avg], dim=-1)
        return torch.softmax(dense(feats), dim=-1)

    batch = 256  # reference default inference batch (__main__.py:104-108)
    x = torch.rand(batch, vecsize, 5)
    with torch.no_grad():
        forward(x)  # warmup
        t0 = time.perf_counter()
        reps = 4
        for _ in range(reps):
            forward(x)
        elapsed = time.perf_counter() - t0
    return reps * batch / elapsed


def get_baseline() -> float:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return float(json.load(f)["windows_per_sec_cpu_reference"])
    baseline = measure_torch_cpu_baseline()
    with open(BASELINE_FILE, "w") as f:
        json.dump({"windows_per_sec_cpu_reference": baseline,
                   "note": "torch-CPU stand-in for TF2-CPU reference, "
                           "OMP=4, batch=256, flagship config"}, f)
    return baseline


def main() -> None:
    codes = make_sequence(SEQ_LEN)
    baseline = get_baseline()
    throughput = measure_tpu(codes)
    print(json.dumps({
        "metric": "windows_per_sec_single_chip",
        "value": round(throughput, 1),
        "unit": "windows/s",
        "vs_baseline": round(throughput / baseline, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
