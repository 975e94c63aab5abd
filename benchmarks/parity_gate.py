#!/usr/bin/env python3
"""Hardware parity gate: record fused-kernel bitwise parity ON REAL TPU.

The fused Pallas kernels are the default parity path on TPU
(``predict.engine.resolve_rnn_kernel``), but the CI suite exercises them
through the Pallas *interpreter*; the real Mosaic compilation can only
regress on hardware.  This driver runs the fused BED bitwise-parity
tests (vs reference-trained HDF5 models, tests/test_reference_parity.py)
plus the kernel-equality suites (tests/test_pallas_rnn.py,
tests/test_pallas_train.py) with ``DEEPGRP_TEST_PLATFORM=tpu`` and
writes the outcome — commit, device, per-suite summary, pass/fail — to
``PARITY_TPU.json`` at the repo root, so the README's parity claim is
backed by a recorded artifact instead of a manual run (VERDICT r4
item 2).

Usage (on a TPU host):
    python benchmarks/parity_gate.py [--out PARITY_TPU.json]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUITES = [
    # The headline guarantee: fused-kernel BEDs == reference BEDs, bitwise.
    "tests/test_reference_parity.py::test_bed_bitwise_parity_fused",
    # Kernel equality: fused inference kernels vs the XLA scan.
    "tests/test_pallas_rnn.py",
    # Custom-VJP train kernels: forward + gradients vs the scan.
    "tests/test_pallas_train.py",
]


def device_info() -> dict:
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; d = jax.devices()[0]; "
         "print(jax.default_backend()); print(d.device_kind)"],
        capture_output=True, text=True, cwd=REPO, timeout=300)
    lines = probe.stdout.strip().splitlines()
    return {"backend": lines[0] if lines else "unknown",
            "device_kind": lines[1] if len(lines) > 1 else "unknown"}


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default=os.path.join(REPO,
                                                      "PARITY_TPU.json"))
    parser.add_argument("--timeout", type=int, default=3600)
    args = parser.parse_args()

    commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                            capture_output=True, text=True
                            ).stdout.strip() or "unknown"
    env = dict(os.environ, DEEPGRP_TEST_PLATFORM="tpu")
    info = device_info()
    results = []
    t0 = time.time()
    ok = True
    for suite in SUITES:
        t = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", suite, "-q", "--tb=line",
             "-p", "no:cacheprovider"],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=args.timeout)
        tail = proc.stdout.strip().splitlines()
        summary = next((ln for ln in reversed(tail)
                        if re.search(r"\d+ (passed|failed|error)", ln)),
                       tail[-1] if tail else "")
        results.append({
            "suite": suite,
            "returncode": proc.returncode,
            "summary": summary.strip("= "),
            "seconds": round(time.time() - t, 1),
        })
        ok = ok and proc.returncode == 0
        print(f"[parity-gate] {suite}: {summary.strip('= ')} "
              f"({results[-1]['seconds']}s)")

    record = {
        "ok": ok,
        "commit": commit,
        "date": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "backend": info["backend"],
        "device_kind": info["device_kind"],
        "platform_env": "DEEPGRP_TEST_PLATFORM=tpu",
        "total_seconds": round(time.time() - t0, 1),
        "suites": results,
    }
    if record["backend"] != "tpu" and "axon" not in record["backend"]:
        record["ok"] = False
        record["error"] = (f"gate must run on TPU hardware; backend is "
                           f"{record['backend']}")
    with open(args.out, "w") as fh:
        json.dump(record, fh, indent=2)
    print(f"[parity-gate] {'PASS' if record['ok'] else 'FAIL'} -> "
          f"{args.out}")
    return 0 if record["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
