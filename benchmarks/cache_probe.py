#!/usr/bin/env python3
"""Diagnose the f32 fused-program persistent-cache key nondeterminism.

Round-4 finding: the bf16 fused ``_scan_slice`` program reliably HITS the
persistent compile cache across processes, but the f32 program writes a
NEW key per process, so every fresh CLI/bench process pays the 160-420 s
first TPU compile through the tunnel.  StableHLO pretty-printed text was
verified deterministic, so the nondeterminism is in one of the cache
key's other components (jax._src.cache_key.get hashes: canonicalized IR
bytecode, jaxlib version, backend platform_version, XLA flags, serialized
compile options, accelerator topology, compression, custom hook).

This driver runs the SAME program construction in N fresh worker
processes, intercepts ``cache_key.get`` (aborting before the expensive
compile), captures the per-entry hashes the key is built from, and diffs
them across processes — naming the component that breaks reuse.

Usage (TPU host):   python benchmarks/cache_probe.py [--runs 2]
Worker (internal):  python benchmarks/cache_probe.py --worker [--dtype f32]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


class _ProbeDone(Exception):
    def __init__(self, key, entries):
        self.key = key
        self.entries = entries


def _capture_entries():
    """Monkeypatch jax's cache-key builder to record per-entry hashes."""
    import hashlib

    import jax._src.cache_key as ck

    original_get = ck.get

    def probing_get(module, devices, compile_options, backend,
                    compression_algorithm="zstandard",
                    ignore_callbacks=ck.IgnoreCallbacks.NO):
        # Only intercept the target program; smaller helper jits (asarray,
        # reshape, ...) compile normally first.
        sym_name = ck.ir.StringAttr(
            module.operation.attributes["sym_name"]).value
        if "scan_slice" not in sym_name:
            return original_get(module, devices, compile_options, backend,
                                compression_algorithm, ignore_callbacks)
        entries = [
            ("computation",
             lambda h: ck._hash_computation(h, module, ignore_callbacks)),
            ("jax_lib_version",
             lambda h: h.update(ck.jaxlib_version_str.encode())),
            ("backend_version",
             lambda h: ck._hash_platform(h, backend)),
            ("xla_flags",
             lambda h: ck._hash_xla_flags(h, ck.get_flag_prefixes())),
            ("compile_options",
             lambda h: ck._hash_serialized_compile_options(
                 h, compile_options,
                 strip_device_assignment=(backend.platform == "gpu"))),
            ("accelerator_config",
             lambda h: ck._hash_accelerator_config(h, devices)),
            ("compression",
             lambda h: ck._hash_string(h, compression_algorithm)),
            ("custom_hook",
             lambda h: ck._hash_string(h, ck.custom_hook())),
        ]
        per_entry = {}
        hash_obj = hashlib.sha256()
        for name, fn in entries:
            solo = hashlib.sha256()
            fn(solo)
            per_entry[name] = solo.hexdigest()
            fn(hash_obj)
        # Extra introspection for the usual suspects.
        per_entry["_platform_version_raw"] = str(backend.platform_version)
        per_entry["_compile_options_serialized_sha"] = hashlib.sha256(
            compile_options.SerializeAsString()).hexdigest()
        raise _ProbeDone("-" + hash_obj.hexdigest(), per_entry)

    ck.get = probing_get
    # compiler.py imported the module, not the symbol — patching the
    # module attribute is enough (it calls cache_key.get via the module).
    import jax._src.compiler as compiler

    for attr in ("cache_key_type",):
        mod = getattr(compiler, attr, None)
        if mod is not None:
            mod.get = probing_get


def worker(dtype_name: str) -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from deepgrp_tpu.config import Options
    from deepgrp_tpu.models import create_model
    from deepgrp_tpu.predict.engine import PredictionEngine

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    options = Options(vecsize=342, units=60, attention=True, dropout=0.0928,
                      batch_size=256)
    model = create_model(options)
    params = model.init(jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    engine = PredictionEngine(model, batch_size=256, step_size=50,
                              compute_dtype=dtype)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=200_000).astype(np.int8)

    _capture_entries()
    try:
        engine.scored_tracks(params, codes)
    except _ProbeDone as done:
        print(json.dumps({"key": done.key, "entries": done.entries}))
        return
    raise SystemExit("cache_key.get was never reached")


def e2e_worker(dtype_name: str) -> None:
    """Time a fresh process's first scored-scan result (cache warm)."""
    import time

    import numpy as np

    import jax
    import jax.numpy as jnp

    from deepgrp_tpu.config import Options
    from deepgrp_tpu.models import create_model
    from deepgrp_tpu.predict.engine import PredictionEngine

    t0 = time.perf_counter()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    options = Options(vecsize=342, units=60, attention=True, dropout=0.0928)
    model = create_model(options)
    params = model.init(jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    engine = PredictionEngine(model, batch_size=256, step_size=50,
                              compute_dtype=dtype)
    codes = np.random.default_rng(0).integers(0, 4,
                                              size=200_000).astype(np.int8)
    track = engine.scored_tracks(params, codes)
    track.host_mss_scores()
    print(json.dumps({"first_result_s": round(time.perf_counter() - t0, 1)}))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--worker", action="store_true")
    parser.add_argument("--e2e-worker", action="store_true")
    parser.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    parser.add_argument("--runs", type=int, default=2)
    parser.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "cache_probe.json"))
    args = parser.parse_args()
    if args.worker:
        worker(args.dtype)
        return 0
    if args.e2e_worker:
        e2e_worker(args.dtype)
        return 0

    report = {}
    for dtype in ("f32", "bf16"):
        runs = []
        for i in range(args.runs):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 "--dtype", dtype],
                capture_output=True, text=True, cwd=REPO, timeout=1800)
            if proc.returncode != 0:
                print(proc.stderr[-3000:])
                return 1
            runs.append(json.loads(proc.stdout.strip().splitlines()[-1]))
            print(f"[probe] {dtype} run {i}: key={runs[-1]['key'][:16]}...")
        stable = all(r["key"] == runs[0]["key"] for r in runs)
        diffs = sorted(
            name for name in runs[0]["entries"]
            if any(r["entries"][name] != runs[0]["entries"][name]
                   for r in runs))
        report[dtype] = {
            "key_stable_across_processes": stable,
            "differing_entries": diffs,
            "runs": runs,
        }
        print(f"[probe] {dtype}: stable={stable} differing={diffs}")

    # End-to-end demonstration: two fresh processes; the second must
    # reach its first result in seconds on a persistent-cache hit (the
    # r4 symptom was a full 160-420 s recompile per process).
    e2e = {}
    for dtype in ("f32", "bf16"):
        walls = []
        for i in range(2):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--e2e-worker",
                 "--dtype", dtype],
                capture_output=True, text=True, cwd=REPO, timeout=1800)
            if proc.returncode != 0:
                print(proc.stderr[-2000:])
                return 1
            walls.append(json.loads(
                proc.stdout.strip().splitlines()[-1])["first_result_s"])
            print(f"[probe] e2e {dtype} process {i}: first result in "
                  f"{walls[-1]}s")
        e2e[dtype] = {"process_walls_s": walls,
                      "second_process_hits": walls[-1] < 60}
    report["e2e_fresh_process"] = e2e
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"[probe] report -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
