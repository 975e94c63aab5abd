"""Run the native C++ self-test (incl. ASAN/UBSAN build) via make."""

import os
import shutil
import subprocess

import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "deepgrp_tpu",
                          "native")


@pytest.mark.skipif(shutil.which("g++") is None or shutil.which("make") is None,
                    reason="toolchain unavailable")
def test_native_selftest_with_sanitizers():
    result = subprocess.run(["make", "-s", "check"], cwd=NATIVE_DIR,
                            capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, result.stdout + result.stderr
    assert result.stdout.count("native selftest OK") == 2
