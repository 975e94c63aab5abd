"""Device mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis: str = DATA_AXIS) -> Mesh:
    """Build a 1-D mesh over ``devices`` (default: all local devices).

    The window-stream parallelism is purely data-parallel, so a single axis
    suffices; multi-host runs get their devices from ``jax.devices()`` after
    ``jax.distributed.initialize``.
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def initialize_distributed(**kwargs) -> None:
    """Multi-host initialization (no-op when already initialized).

    Thin wrapper over ``jax.distributed.initialize`` so callers need not
    import jax.distributed; coordinator address etc. come from the standard
    environment variables on TPU pods.  Real init failures (bad coordinator
    address, port clash, timeout) PROPAGATE — only the already-initialized
    case is tolerated, so a job cannot silently degrade to single-host.
    """
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(**kwargs)
