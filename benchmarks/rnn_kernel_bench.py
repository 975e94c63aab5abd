#!/usr/bin/env python3
"""Microbenchmark: fused Pallas GRU kernel vs XLA ``lax.scan`` recurrence.

Sweeps GRU width, IO dtype, and kernel tile parameters at the inference
engine's shapes (doubled batch 2048 — the fwd+revcomp trick — over the
flagship window length T=342) on the current default JAX platform (run on
the real TPU).  Writes ``benchmarks/rnn_kernel_bench.json`` and prints a
markdown table; the measured crossover drives the engine's automatic
``rnn_apply`` dispatch (models/dispatch.py).

Usage: python benchmarks/rnn_kernel_bench.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from deepgrp_tpu.models import pallas_rnn, rnn

BATCH = 2048
T_STEPS = 342
REPS = 10


def _sync(out) -> float:
    """Force completion with a real value fetch.

    ``block_until_ready`` alone is unreliable on tunneled platforms; a
    scalar device_get cannot return before every enqueued computation on
    the stream has finished (in-order execution).
    """
    leaves = jax.tree.leaves(out)
    return float(jnp.sum(leaves[-1][0].astype(jnp.float32)))


def bench(fn, *args) -> float:
    out = fn(*args)
    _sync(out)
    # Measure the fetch overhead alone so it can be subtracted.
    t0 = time.perf_counter()
    _sync(out)
    fetch_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _sync(out)
    elapsed = time.perf_counter() - t0
    return max(elapsed - fetch_s, 1e-9) / REPS * 1e3  # ms


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="flagship width only")
    args = parser.parse_args()

    units_sweep = [60] if args.quick else [32, 60, 128, 256]
    rows = []
    for units in units_sweep:
        params = rnn.gru_init(jax.random.PRNGKey(0), 5, units)
        for dtype_name, dtype in (("float32", jnp.float32),
                                  ("bfloat16", jnp.bfloat16)):
            x = jnp.asarray(
                np.eye(5, dtype=np.float32)[
                    np.random.default_rng(0).integers(
                        0, 5, size=(BATCH, T_STEPS))], dtype)
            p = jax.tree.map(lambda a: a.astype(dtype), params)

            scan_fn = jax.jit(lambda p, x: rnn.gru_apply(p, x))
            scan_ms = bench(scan_fn, p, x)

            best_pallas = None
            for time_block in (8, 16):
                for block_b in (256, 512, 1024):
                    fn = jax.jit(lambda p, x, tb=time_block, bb=block_b:
                                 pallas_rnn.pallas_gru_apply(
                                     p, x, block_b=bb, time_block=tb))
                    try:
                        ms = bench(fn, p, x)
                    except Exception as err:  # oversize VMEM etc.
                        print(f"  units={units} {dtype_name} "
                              f"tb={time_block} bb={block_b}: "
                              f"{type(err).__name__}", flush=True)
                        continue
                    print(f"  units={units} {dtype_name} tb={time_block} "
                          f"bb={block_b}: {ms:.2f} ms", flush=True)
                    if best_pallas is None or ms < best_pallas["ms"]:
                        best_pallas = {"ms": ms, "time_block": time_block,
                                       "block_b": block_b}
            row = {
                "units": units, "dtype": dtype_name,
                "scan_ms": round(scan_ms, 2),
            }
            if best_pallas is not None:
                row.update(
                    pallas_ms=round(best_pallas["ms"], 2),
                    pallas_time_block=best_pallas["time_block"],
                    pallas_block_b=best_pallas["block_b"],
                    pallas_speedup=round(scan_ms / best_pallas["ms"], 2),
                )
            rows.append(row)
            print(row, flush=True)

    # --- v2 fused kernel: codes -> avg(fwd, revcomp) + hidden ----------
    # Compared against the scan COMPOSITION it replaces (one-hot expand +
    # doubled-batch scan + branch average), which is what the engine's
    # chunk forward actually runs per window batch.
    from deepgrp_tpu.models.model import reverse_complement

    n_windows = BATCH // 2  # engine doubles the batch internally
    codes_np = np.random.default_rng(1).integers(
        0, 5, size=(n_windows, T_STEPS))
    for units in units_sweep:
        params = rnn.gru_init(jax.random.PRNGKey(0), 5, units)
        for dtype_name, dtype in (("float32", jnp.float32),
                                  ("bfloat16", jnp.bfloat16)):
            codes = jnp.asarray(codes_np, jnp.int32)
            p = jax.tree.map(lambda a: a.astype(dtype), params)

            def scan_composed(p, codes, dtype=dtype):
                x = jax.nn.one_hot(codes, 5, dtype=dtype)
                both = jnp.concatenate([x, reverse_complement(x)], axis=0)
                seq, last = rnn.gru_apply(p, both)
                avg = (seq[:n_windows] + seq[n_windows:]) * 0.5
                hidden = (last[:n_windows] + last[n_windows:]) * 0.5
                return avg, hidden

            scan_ms = bench(jax.jit(scan_composed), p, codes)
            best = None
            # block_b=1024 (a [2048, .] combined batch) crashes the Mosaic
            # compiler subprocess outright — excluded from the sweep.
            for time_block in (8, 16):
                for block_b in (256, 512):
                    fn = jax.jit(lambda p, c, tb=time_block, bb=block_b,
                                 dt=dtype: pallas_rnn.pallas_gru_avg(
                                     p, c, block_b=bb, time_block=tb,
                                     out_dtype=dt))
                    try:
                        ms = bench(fn, params, codes)
                    except Exception as err:
                        print(f"  v2 units={units} {dtype_name} "
                              f"tb={time_block} bb={block_b}: "
                              f"{type(err).__name__}", flush=True)
                        continue
                    print(f"  v2 units={units} {dtype_name} "
                          f"tb={time_block} bb={block_b}: {ms:.2f} ms",
                          flush=True)
                    if best is None or ms < best["ms"]:
                        best = {"ms": ms, "time_block": time_block,
                                "block_b": block_b}
            row = {"kernel": "v2_avg", "units": units, "dtype": dtype_name,
                   "scan_ms": round(scan_ms, 2)}
            if best is not None:
                row.update(pallas_ms=round(best["ms"], 2),
                           pallas_time_block=best["time_block"],
                           pallas_block_b=best["block_b"],
                           pallas_speedup=round(scan_ms / best["ms"], 2))
            rows.append(row)
            print(row, flush=True)

    # --- v2 fused LSTM: same contract, 4 gates, (h, c) carry -----------
    for units in units_sweep:
        lstm_params = rnn.lstm_init(jax.random.PRNGKey(0), 5, units)
        for dtype_name, dtype in (("float32", jnp.float32),
                                  ("bfloat16", jnp.bfloat16)):
            codes = jnp.asarray(codes_np, jnp.int32)
            p = jax.tree.map(lambda a: a.astype(dtype), lstm_params)

            def scan_composed_lstm(p, codes, dtype=dtype):
                x = jax.nn.one_hot(codes, 5, dtype=dtype)
                both = jnp.concatenate([x, reverse_complement(x)], axis=0)
                seq, last = rnn.lstm_apply(p, both)
                avg = (seq[:n_windows] + seq[n_windows:]) * 0.5
                hidden = (last[:n_windows] + last[n_windows:]) * 0.5
                return avg, hidden

            scan_ms = bench(jax.jit(scan_composed_lstm), p, codes)
            best = None
            for time_block in (8, 16):
                for block_b in (256, 512):
                    fn = jax.jit(lambda p, c, tb=time_block, bb=block_b,
                                 dt=dtype: pallas_rnn.pallas_lstm_avg(
                                     p, c, block_b=bb, time_block=tb,
                                     out_dtype=dt))
                    try:
                        ms = bench(fn, lstm_params, codes)
                    except Exception as err:
                        print(f"  v2-lstm units={units} {dtype_name} "
                              f"tb={time_block} bb={block_b}: "
                              f"{type(err).__name__}", flush=True)
                        continue
                    print(f"  v2-lstm units={units} {dtype_name} "
                          f"tb={time_block} bb={block_b}: {ms:.2f} ms",
                          flush=True)
                    if best is None or ms < best["ms"]:
                        best = {"ms": ms, "time_block": time_block,
                                "block_b": block_b}
            row = {"kernel": "v2_avg_lstm", "units": units,
                   "dtype": dtype_name, "scan_ms": round(scan_ms, 2)}
            if best is not None:
                row.update(pallas_ms=round(best["ms"], 2),
                           pallas_time_block=best["time_block"],
                           pallas_block_b=best["block_b"],
                           pallas_speedup=round(scan_ms / best["ms"], 2))
            rows.append(row)
            print(row, flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "rnn_kernel_bench.json")
    with open(out_path, "w") as fh:
        json.dump({"batch": BATCH, "t_steps": T_STEPS,
                   "platform": jax.devices()[0].platform,
                   "device": str(jax.devices()[0]),
                   "rows": rows}, fh, indent=2)

    print("\n| units | dtype | scan ms | pallas ms | speedup |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['units']} | {r['dtype']} | {r['scan_ms']} | "
              f"{r.get('pallas_ms', 'OOM')} | "
              f"{r.get('pallas_speedup', '-')}x |")
    print(f"\nwritten to {out_path}")


if __name__ == "__main__":
    main()
