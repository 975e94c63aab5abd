"""bench.py smoke test: every phase runs end to end at toy scale.

The driver executes ``python bench.py`` on real hardware at the end of
every round; a regression in any phase would otherwise only surface
there.  This exercises the same code paths (e2e f32/bf16, device-only,
trained-fixture scan, train throughput, JSON assembly) on the CPU
backend with a tiny sequence, using the cached baseline file so no TF
subprocess runs.
"""

import importlib
import json
import sys

import pytest


@pytest.mark.slow
def test_bench_phases_run(monkeypatch, capsys, tmp_path):
    monkeypatch.setenv("BENCH_SEQ_LEN", "40000")
    monkeypatch.setenv("BENCH_BATCH", "64")
    monkeypatch.setenv("BENCH_TRAIN_REPS", "2")
    import bench

    importlib.reload(bench)  # re-read the env knobs

    # Use a fake cached baseline: get_baseline() must not launch TF.
    baseline = tmp_path / "baseline.json"
    baseline.write_text(json.dumps({
        "windows_per_sec_cpu_reference": 650.0,
        "train_steps_per_sec_cpu_reference": 0.7,
        "source": "test stub",
    }))
    monkeypatch.setattr(bench, "BASELINE_FILE", str(baseline))

    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(line)
    assert data["metric"] == "windows_per_sec_single_chip"
    assert data["value"] > 0 and data["vs_baseline"] > 0
    extra = data["extra"]
    for key in ("windows_per_sec_bfloat16", "device_only_windows_per_sec",
                "device_only_windows_per_sec_bfloat16", "trained_scan",
                "train_steps_per_sec", "e2e_stats"):
        assert key in extra, key
    trained = extra["trained_scan"]
    assert trained["windows_per_sec"] > 0
    assert trained["e2e_over_device_compute"] > 0
    assert "mss_route" in trained
