#!/usr/bin/env python3
"""Interleaved SLICE_CHUNKS sweep for the e2e pipeline (f32 + bf16).

The slice size trades per-dispatch/per-fetch fixed overheads (favoring
big slices) against the un-hideable last-slice fetch tail and earlier
streaming-MSS starts (favoring small slices); the bf16 3 B/bp transport
shifts that balance vs the f32 5 B/bp one.  Sweeps
``DEEPGRP_SLICE_CHUNKS`` values INTERLEAVED inside one process (tunnel
weather hits every variant equally; separate processes are
incomparable) on the untrained-noisy BENCH e2e configuration and writes
``benchmarks/slice_sweep.json``.

Usage (TPU host): python benchmarks/slice_sweep.py [--values 2,4,8,12]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SEQ_LEN = int(os.environ.get("BENCH_SEQ_LEN", 2_000_000))
STEP = 50
BATCH = 1024


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--values", default="2,4,8,12")
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()
    values = [int(v) for v in args.values.split(",")]

    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepgrp_tpu.config import Options
    from deepgrp_tpu.models import create_model
    from deepgrp_tpu.predict.engine import PredictionEngine, window_starts
    from deepgrp_tpu.predict.postprocess import predict_sequence

    options = Options(vecsize=342, units=60, attention=True, dropout=0.0928)
    model = create_model(options)
    params = jax.device_put(model.init(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=SEQ_LEN).astype(np.int8)
    n_windows = window_starts(SEQ_LEN, options.vecsize, STEP).size

    engines = {
        "float32": PredictionEngine(model, batch_size=BATCH, step_size=STEP,
                                    compute_dtype=jnp.float32),
        "bfloat16": PredictionEngine(model, batch_size=BATCH, step_size=STEP,
                                     compute_dtype=jnp.bfloat16),
    }

    def run(engine, sc):
        os.environ["DEEPGRP_SLICE_CHUNKS"] = str(sc)
        try:
            return predict_sequence(model, params, codes, options, STEP,
                                    use_mss=True, engine=engine,
                                    device_mss="auto")
        finally:
            del os.environ["DEEPGRP_SLICE_CHUNKS"]

    # Compile every (dtype, sc) variant first.
    for name, engine in engines.items():
        for sc in values:
            run(engine, sc)
            print(f"[sweep] compiled {name} sc={sc}", flush=True)

    times = {name: {sc: [] for sc in values} for name in engines}
    for rep in range(args.reps):
        for sc in values:
            for name, engine in engines.items():
                t0 = time.perf_counter()
                run(engine, sc)
                dt = time.perf_counter() - t0
                times[name][sc].append(dt)
                print(f"[sweep] rep {rep} {name} sc={sc}: {dt:.3f}s",
                      flush=True)

    result = {
        "date": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "seq_len": SEQ_LEN, "n_windows": int(n_windows), "batch": BATCH,
        "results": {
            name: {
                str(sc): {
                    "e2e_s": sorted(round(t, 4) for t in ts),
                    "windows_per_sec": round(n_windows / min(ts), 1),
                } for sc, ts in per.items()
            } for name, per in times.items()
        },
    }
    for name, per in times.items():
        best = min(per, key=lambda sc: min(per[sc]))
        result["results"][name]["best"] = str(best)
        print(f"[sweep] {name}: best SLICE_CHUNKS={best} "
              f"({n_windows / min(per[best]):.0f} w/s)")
    out = os.path.join(REPO, "benchmarks", "slice_sweep.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(f"[sweep] -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
