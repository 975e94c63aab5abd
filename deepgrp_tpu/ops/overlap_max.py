"""Overlap-max merging of sliding-window predictions.

The reference merges overlapping window outputs into a genome-length array
by a strided elementwise max on the host (``/root/reference/deepgrp/
maxcalc.c:10-24``, wrapped at ``sequence.pyx:67-76``).  Here the production
path is on-device: the merge is reformulated as a max over K = ceil(V/step)
shifted chunk layers — pure dense VPU work with no scatter, fusable under
``jit`` with the model forward.

``get_max`` keeps the reference's host API (in-place max into an output
array) for parity tests and host-only runs.
"""

from __future__ import annotations

import ctypes
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from deepgrp_tpu import native


def get_max(output: np.ndarray, inputs: np.ndarray,
            stride: int) -> np.ndarray:
    """In-place strided overlap max (host; sequence.pyx:67-76 parity).

    ``output[b*stride + i, j] = max(output[b*stride + i, j], inputs[b, i, j])``
    for every window ``b``.  ``output`` must be float32 C-contiguous and have
    at least ``(batch-1)*stride + dim0`` rows.
    """
    if inputs.ndim != 3 or output.ndim != 2:
        raise ValueError("inputs must be [batch, dim0, dim1], output 2-D")
    batch, dim0, dim1 = inputs.shape
    if output.shape[1] != dim1:
        raise ValueError("output and inputs disagree on dim1")
    if batch and output.shape[0] < (batch - 1) * stride + dim0:
        raise ValueError("output too small for the window span")
    lib = native.load()
    if (lib is not None and output.flags.c_contiguous
            and inputs.flags.c_contiguous and output.dtype == np.float32
            and inputs.dtype == np.float32):
        lib.dg_overlap_max(
            output.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            inputs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dim0, dim1, stride, batch)
        return output
    for b in range(batch):
        lo = b * stride
        np.maximum(output[lo:lo + dim0], inputs[b],
                   out=output[lo:lo + dim0])
    return output


@partial(jax.jit, static_argnames=("step", "out_len"))
def overlap_max_merge(windows: jax.Array, step: int,
                      out_len: int) -> jax.Array:
    """Merge window predictions ``[N, V, C]`` into ``[out_len, C]`` on device.

    Window ``b`` covers output rows ``[b*step, b*step + V)``; each output row
    is the max over all covering windows and an implicit zero initializer
    (the reference merges into a zero-filled buffer, prediction.py:103, so
    uncovered rows are 0 and covered rows are >= 0).

    Implementation: split each window into K = ceil(V/step) chunks of
    ``step`` rows (last chunk -inf padded); chunk j of window b lands at
    output block b + j, so layer j is the chunk-j sequence shifted by j
    blocks.  The merge is then a single max over the K stacked layers.
    """
    n_windows, vecsize, n_classes = windows.shape
    if n_windows == 0:
        return jnp.zeros((out_len, n_classes), dtype=windows.dtype)
    k = -(-vecsize // step)  # ceil
    pad_v = k * step - vecsize
    neg = jnp.asarray(-jnp.inf, dtype=windows.dtype)
    chunks = jnp.pad(windows, ((0, 0), (0, pad_v), (0, 0)),
                     constant_values=neg)
    chunks = chunks.reshape(n_windows, k, step, n_classes)
    n_blocks = n_windows + k - 1
    layers = [
        jnp.pad(chunks[:, j], ((j, k - 1 - j), (0, 0), (0, 0)),
                constant_values=neg)
        for j in range(k)
    ]
    merged = jnp.stack(layers).max(axis=0).reshape(n_blocks * step, n_classes)
    merged = jnp.maximum(merged, 0)  # zero initializer semantics
    if out_len <= merged.shape[0]:
        return merged[:out_len]
    return jnp.pad(merged, ((0, out_len - merged.shape[0]), (0, 0)))
