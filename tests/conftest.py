"""Test configuration.

Tests run on a virtual 8-device CPU platform so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multichip
path; benchmarks use the real chip).  Environment must be set before JAX is
imported anywhere.
"""

import os
import random
import string

# DEEPGRP_TEST_PLATFORM=tpu runs the suite on the real chip (used to
# validate kernel/parity tests on hardware); default is the virtual CPU mesh.
_platform = os.environ.get("DEEPGRP_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if (_platform == "cpu"
        and "xla_force_host_platform_device_count" not in _flags):
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Something in this environment (the axon TPU plugin) wins over the env var,
# so force the platform through the config API as well.
if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def randomword():
    def _make(length: int) -> str:
        return "".join(
            random.choice(string.ascii_lowercase) for _ in range(length))

    return _make


@pytest.fixture
def random_dna():
    def _make(length: int, alphabet: str = "ACGTN", seed: int = None) -> str:
        rng = random.Random(seed)
        return "".join(rng.choice(alphabet) for _ in range(length))

    return _make
