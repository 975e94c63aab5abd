"""``python -m deepgrp_tpu`` entry point.

The ``--threads/-t`` flag is pre-scanned from ``sys.argv`` and exported as
``OMP_NUM_THREADS`` BEFORE any heavy import: OpenMP/BLAS pools size
themselves when the libraries initialize, so setting the variable inside
the normal CLI flow (after numpy/jax are up) would only cap this package's
own MSS workers, not the numeric libraries (reference semantics: the flag
sized TF's host pools, __main__.py:221-233).
"""

import os
import sys


def _prescan_threads(argv) -> None:
    if "OMP_NUM_THREADS" in os.environ:
        return
    for i, arg in enumerate(argv):
        if arg in ("-t", "--threads") and i + 1 < len(argv):
            value = argv[i + 1]
        elif arg.startswith(("--threads=", "-t=")):
            value = arg.split("=", 1)[1]
        else:
            continue
        if value.isdigit() and int(value) > 0:
            os.environ["OMP_NUM_THREADS"] = value
        return


_prescan_threads(sys.argv[1:])

from deepgrp_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    main()
