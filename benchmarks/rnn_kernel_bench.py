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

from deepgrp_tpu.models import pallas_rnn, rnn

BATCH = 2048
T_STEPS = 342
REPS = 10


def bench(fn, *args) -> float:
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    return (time.perf_counter() - t0) / REPS * 1e3  # ms


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
                              f"tb={time_block} bb={block_b}: {err}")
                        continue
                    if best_pallas is None or ms < best_pallas["ms"]:
                        best_pallas = {"ms": ms, "time_block": time_block,
                                       "block_b": block_b}
            row = {
                "units": units, "dtype": dtype_name,
                "scan_ms": round(scan_ms, 2),
                "pallas_ms": round(best_pallas["ms"], 2),
                "pallas_time_block": best_pallas["time_block"],
                "pallas_block_b": best_pallas["block_b"],
                "pallas_speedup": round(scan_ms / best_pallas["ms"], 2),
            }
            rows.append(row)
            print(row)

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
              f"{r['pallas_ms']} | {r['pallas_speedup']}x |")
    print(f"\nwritten to {out_path}")


if __name__ == "__main__":
    main()
