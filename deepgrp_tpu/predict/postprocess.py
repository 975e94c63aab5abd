"""Prediction post-processing: MSS application and softmax.

Parity with ``/root/reference/deepgrp/prediction.py:40-65,114-141``.
"""

from __future__ import annotations

from os import PathLike
from typing import Optional

import numpy as np

from deepgrp_tpu.config import Options
from deepgrp_tpu.data.preprocess import Data
from deepgrp_tpu.models.model import DeepGRPModel, create_model
from deepgrp_tpu.ops import mss
from deepgrp_tpu.predict.engine import PredictionEngine


def apply_mss(probs: np.ndarray, options: Options) -> np.ndarray:
    """Score and segment merged probabilities (prediction.py:40-59 parity).

    Per-position score is the clamped logit of the max probability:
    ``t = log(p/(1-p))`` with ``p = min(max_prob + 1e-6, 0.99)``;
    background-class positions are penalized ``-10*t``, repeat positions
    score ``+t``; then Ruzzo–Tompa with majority-vote labeling.
    """
    nof_labels = probs.shape[1]
    results_classes = probs.argmax(axis=1)
    mins = probs.max(axis=1) + 1e-6
    mins = np.where(mins > 0.99, 0.99, mins)
    t_scores = np.log(mins / (1 - mins))
    scores = np.where(results_classes > 0, t_scores,
                      -10 * t_scores).astype(float)
    return mss.find_mss_labels(scores, results_classes.astype(np.int64),
                               nof_labels, options.min_mss_len,
                               options.xdrop_len)


def apply_mss_scored(classes: np.ndarray, maxp: np.ndarray,
                     options: Options, nof_labels: int) -> np.ndarray:
    """``apply_mss`` from device-computed argmax/max instead of full probs.

    Bit-identical to :func:`apply_mss`: the reference computes the score
    transform on the float32 row maxima (prediction.py:53-57, numpy keeps
    float32 until the final cast), so transferring only ``max(axis=1)``
    and ``argmax(axis=1)`` loses nothing.
    """
    from deepgrp_tpu.predict.engine import mss_score_transform

    scores = mss_score_transform(classes, maxp).astype(float)
    return mss.find_mss_labels(scores, classes.astype(np.int64), nof_labels,
                               options.min_mss_len, options.xdrop_len)


def apply_mss_on_device(classes, maxp, options: Options, nof_labels: int,
                        out_len: int,
                        runs: Optional[int] = None) -> np.ndarray:
    """All-on-chip ``apply_mss``: device scored arrays -> MSS classes.

    The score transform, Ruzzo-Tompa segment search, and majority-vote
    labeling all run under jit (``ops.mss_device``); only the final
    per-position int32 class array crosses to the host.  Capacity for the
    positive-run stack is sized from the data (``runs`` skips the on-device
    recount when the caller already fetched it; power-of-two buckets bound
    recompiles) with an overflow-doubling retry.
    """
    import jax.numpy as jnp

    from deepgrp_tpu.ops import mss_device

    if classes.shape[0] < out_len:
        # Uncovered tail (no window reaches it): the reference scores it
        # as zero-probability rows (prediction.py:90 zeros + :51-57), so
        # it must participate in the MSS, not be masked out.
        pad = out_len - classes.shape[0]
        classes = jnp.concatenate(
            [classes, jnp.zeros((pad,), classes.dtype)])
        maxp = jnp.concatenate([maxp, jnp.zeros((pad,), maxp.dtype)])
    out_len_t = jnp.int32(out_len)
    if runs is None:
        runs = _scored_run_count(classes, maxp, out_len_t)
    max_runs = max(64, 1 << int(max(int(runs), 1)).bit_length())
    while True:
        assigned, overflow = mss_device.mss_classes_from_scored(
            classes, maxp, out_len_t, nof_labels, options.min_mss_len,
            options.xdrop_len, max_runs=max_runs)
        if not bool(overflow):
            # uint8 cast on device: 4x less device->host transfer
            # (class ids are < 256 by construction).
            from deepgrp_tpu.predict.engine import _sim_fetch

            return _sim_fetch(assigned[:out_len].astype(jnp.uint8))
        max_runs *= 2


def _assemble_collapse_fused_impl(packed_slices, spill, out_len, rows: int,
                                  maxp_itemsize: int, pad: int,
                                  capacity: int):
    import jax.numpy as jnp

    from deepgrp_tpu.ops import mss_device
    from deepgrp_tpu.predict.engine import _assemble_scored_slices

    classes, maxp = _assemble_scored_slices(packed_slices, spill, rows,
                                            maxp_itemsize)
    if pad > 0:
        # Uncovered tail: zero-probability rows participate in the
        # MSS (reference prediction.py:90 zeros + :51-57).
        classes = jnp.concatenate(
            [classes, jnp.zeros((pad,), classes.dtype)])
        maxp = jnp.concatenate([maxp, jnp.zeros((pad,), maxp.dtype)])
    buf = mss_device.collapse_candidates_packed(classes, maxp, out_len,
                                                capacity=capacity)
    return classes, buf


# Module-level jit so the compiled program is cached across calls (a
# per-call wrapper would retrace/recompile on every chromosome).
_assemble_collapse_fused_jit = None


def _assemble_collapse_fused(packed_slices, spill, rows: int,
                             maxp_itemsize: int, pad: int, out_len,
                             capacity: int):
    """Slice assembly + run collapse as ONE device program.

    The hybrid MSS route previously launched assembly and collapse as
    separate programs; through a high-latency link each extra dispatch
    costs a ~50-100 ms round trip, on the exact path the weather-based
    re-route takes when the link is slow.  Fusing them also avoids
    materializing the assembled maxp track in HBM between programs.
    """
    global _assemble_collapse_fused_jit
    if _assemble_collapse_fused_jit is None:
        import functools

        import jax

        _assemble_collapse_fused_jit = functools.partial(
            jax.jit, static_argnames=("rows", "maxp_itemsize", "pad",
                                      "capacity"))(
            _assemble_collapse_fused_impl)
    return _assemble_collapse_fused_jit(packed_slices, spill, out_len,
                                        rows=rows,
                                        maxp_itemsize=maxp_itemsize,
                                        pad=pad, capacity=capacity)


def apply_mss_candidates(track, options: Options, nof_labels: int,
                         runs_hint: int) -> Optional[np.ndarray]:
    """Hybrid MSS: device run collapse -> host stack scan -> device label.

    The production sparse-track route: dense work (score transform, run
    collapse, majority-vote labeling) runs on device; only the collapsed
    candidate set (16 B per positive run — ~10 KB for a trained 2 Mbp
    track) and the final 1 B/bp class array cross the link; the
    inherently sequential Ruzzo-Tompa stack scan runs as host scalar code
    in microseconds instead of a latency-bound on-device while-loop
    (measured ~0.5 ms/run on v5e).  Bit-identical to
    ``apply_mss_on_device`` (the host scan replicates the device
    run_body's f32 arithmetic exactly; tests enforce).

    Returns ``None`` on candidate-capacity overflow (the ``runs_hint``
    undercounted — callers fall back to another route).
    """
    import math

    import jax.numpy as jnp

    from deepgrp_tpu.ops import mss_device

    from deepgrp_tpu.predict.engine import _sim_fetch

    out_len = track.out_len
    capacity = 1 << max(6, math.ceil(math.log2(max(runs_hint + 10, 2))))
    state = getattr(track, "_state", None)
    if (hasattr(getattr(track, "_engine", None), "_mss_classes_streaming")
            and state is not None and len(state) == 3):
        # Single-device engine: assembly + run collapse fused into ONE
        # program launch over the already-dispatched packed slices (the
        # weather re-route lands here exactly when dispatch round trips
        # are expensive).
        slices, spill, rows_per_slice = state
        covered = len(slices) * rows_per_slice + int(spill.shape[0])
        pad = max(0, out_len - covered)
        classes_d, buf_d = _assemble_collapse_fused(
            tuple(s[0] for s in slices), spill, rows_per_slice,
            track._engine._maxp_itemsize, pad, jnp.int32(out_len),
            capacity)
        buf = _sim_fetch(buf_d)
    else:
        classes_d, maxp_d = track.device()
        if classes_d.shape[0] < out_len:
            # Uncovered tail: the reference scores it as zero-probability
            # rows (prediction.py:90 zeros + :51-57 -> POSITIVE background
            # score), so it must participate in the MSS, exactly as in
            # :func:`apply_mss_on_device`.
            pad = out_len - classes_d.shape[0]
            classes_d = jnp.concatenate(
                [classes_d, jnp.zeros((pad,), classes_d.dtype)])
            maxp_d = jnp.concatenate(
                [maxp_d, jnp.zeros((pad,), maxp_d.dtype)])
        buf = _sim_fetch(mss_device.collapse_candidates_packed(
            classes_d, maxp_d, jnp.int32(out_len), capacity=capacity))
    n_runs, overflow, starts, ends, l_glob, r_glob = (
        mss_device.unpack_candidates(buf, capacity))
    if overflow:
        return None
    s0 = math.log(0.99 / (1.0 - 0.99))
    min_sc = s0 * options.min_mss_len
    xdrop = s0 * options.xdrop_len * 10.0 if options.xdrop_len > 0 else -1.0
    seg_s, seg_e = mss_device.mss_stack_from_candidates(
        starts, ends, l_glob, r_glob, n_runs, min_sc, xdrop)
    cap2 = 1 << max(6, math.ceil(math.log2(len(seg_s) + 2)))
    segbuf = np.zeros(1 + 2 * cap2, np.int32)  # one packed h2d upload
    segbuf[0] = len(seg_s)
    segbuf[1:1 + len(seg_s)] = seg_s
    segbuf[1 + cap2:1 + cap2 + len(seg_e)] = seg_e
    assigned = mss_device.assign_segment_classes(
        classes_d, jnp.int32(out_len), jnp.asarray(segbuf),
        nof_labels=nof_labels, capacity=cap2)
    # Chunked concurrent fetch: the uint8 class array is the route's one
    # bulk transfer; overlapping 4 sub-fetches hides most of the
    # per-fetch round-trip on a slow link.  (Fetch the full padded array
    # and crop on host — an on-device crop would cost its own dispatch
    # round trip for <= 3% fewer bytes.)
    from concurrent.futures import ThreadPoolExecutor

    n = assigned.shape[0]
    n_chunks = 4 if n >= (1 << 20) else 1
    bounds = [(k * n // n_chunks, (k + 1) * n // n_chunks)
              for k in range(n_chunks)]
    with ThreadPoolExecutor(n_chunks) as ex:
        parts = list(ex.map(lambda ab: _sim_fetch(assigned[ab[0]:ab[1]]),
                            bounds))
    return np.concatenate(parts)[:out_len]


def _scored_run_count(classes, maxp, out_len):
    """Positive-run count of the MSS score track (to size ``max_runs``)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def count(classes, maxp, out_len):
        idx = jnp.arange(classes.shape[0], dtype=jnp.int32)
        in_len = idx < out_len
        labels = jnp.where(in_len, classes.astype(jnp.int32), 0)
        mins = jnp.minimum(maxp.astype(jnp.float32) + jnp.float32(1e-6),
                           jnp.float32(0.99))
        t_scores = jnp.log(mins / (1 - mins))
        scores = jnp.where(labels > 0, t_scores, -10 * t_scores)
        pos = (scores > 0) & in_len
        prev = jnp.concatenate([jnp.zeros((1,), bool), pos[:-1]])
        return jnp.sum((pos & ~prev).astype(jnp.int32))

    return int(count(classes, maxp, out_len))


def softmax(array: np.ndarray) -> np.ndarray:
    """Reference softmax (prediction.py:62-65): global max subtraction."""
    e_x = np.exp(array - np.max(array))
    return e_x / e_x.sum(axis=1, keepdims=True)


# Auto device-MSS routing threshold: run the all-on-chip MSS when the
# score track has at most this many positive runs.  Ruzzo-Tompa's
# candidate scan is O(runs) sequential on device, so sparse trained-model
# tracks (measured fixtures: ~0.1-4% runs/bp) stay on chip — transferring
# 1 B/bp instead of 5 B/bp — while a noisy (untrained) track routes to the
# pipelined fetch + multithreaded host MSS.  Override with the
# DEEPGRP_DEVICE_MSS_MAX_RUNS environment variable.
DEVICE_MSS_AUTO_MAX_RUNS = 16384


def _auto_max_runs() -> int:
    import os

    return int(os.environ.get("DEEPGRP_DEVICE_MSS_MAX_RUNS",
                              DEVICE_MSS_AUTO_MAX_RUNS))


def _host_mss_classes(classes: np.ndarray, scores: np.ndarray,
                      options: Options, nof_labels: int) -> np.ndarray:
    """Native multithreaded MSS on a pre-transformed score track.

    Bit-identical to ``apply_mss_scored(...).argmax(axis=1)`` (the C++
    library emits class ids directly, skipping the one-hot intermediate).
    """
    return mss.find_mss_classes(scores.astype(float),
                                classes.astype(np.int64), nof_labels,
                                options.min_mss_len, options.xdrop_len)


def predict_sequence(model: DeepGRPModel, params, onehot: np.ndarray,
                     options: Options, step_size: int,
                     use_mss: bool,
                     engine: Optional[PredictionEngine] = None,
                     device_mss="auto") -> np.ndarray:
    """One-hot sequence -> per-position class array (CLI ``_predict`` core,
    __main__.py:46-83).

    ``device_mss`` routes the MSS post-processing:

      * ``"auto"`` (production default): on the single-device engine, the
        STREAMING host route — packed scored slices fetched concurrently
        behind the chunk-scan compute, per-block Ruzzo-Tompa during the
        transfers — the measured winner at every track density
        (benchmarks/mss_route_bench.json).  On the sharded engine
        (ICI-attached pods), transfer-light routing by track sparsity:
        sparse tracks take the hybrid device-collapse/host-stack/device-
        label route (1 B/bp off-chip), noisy tracks the host MSS.
      * ``True``/``"on"``: force the all-on-chip path.
      * ``False``/``"off"``: force the plain host path.

    All routes are bit-identical on the fixture BEDs (tests); the
    softmax (``use_mss=False``) path needs the full probability matrix.
    """
    if engine is None:
        engine = PredictionEngine(model, batch_size=options.batch_size,
                                  step_size=step_size)
    nof_labels = model.config.n_classes
    out_len = onehot.shape[-1]

    def zero_window_quirk() -> np.ndarray:
        # Zero windows: the reference still applies MSS to the all-zero
        # probability buffer, labeling the whole record class 1
        # (prediction.py:51-57 on zeros) — keep that quirk.
        out = apply_mss_scored(np.zeros(out_len, np.int8),
                               np.zeros(out_len, np.float32), options,
                               nof_labels)
        return np.asanyarray(out.argmax(axis=1))

    if use_mss and device_mss in (True, "on") and hasattr(
            engine, "predict_scored_device"):
        if not getattr(engine, "device_route_ok", lambda: True)():
            # Multi-host sharded run: the assembled scored track is a
            # replicated GLOBAL array that is not fully addressable per
            # process, so the forced on-device route cannot fetch it —
            # same guard the auto route applies.
            import logging

            logging.getLogger(__name__).warning(
                "device_mss='on' is unavailable on multi-host runs "
                "(global track not addressable per process); using the "
                "host MSS route")
        else:
            classes_d, maxp_d, _ = engine.predict_scored_device(params,
                                                                onehot)
            if classes_d is None:
                return zero_window_quirk()
            return apply_mss_on_device(classes_d, maxp_d, options,
                                       nof_labels, out_len)
    if use_mss:
        if (device_mss == "auto" and hasattr(engine, "scored_tracks")
                and getattr(engine, "device_route_ok", lambda: True)()):
            track = engine.scored_tracks(params, onehot)
            if track is None:
                return zero_window_quirk()
            if hasattr(engine, "_mss_classes_streaming"):
                # Single-device engine: WEATHER-ADAPTIVE routing.  In
                # good weather the STREAMING host route wins at every
                # track density (benchmarks/mss_route_bench.json:
                # trained 2 Mbp track, interleaved best-of — streaming
                # 431 ms vs pure device-MSS 590 ms vs hybrid 757 ms;
                # compute floor 251 ms): the packed fetch rides behind
                # the chunk-scan compute.  But the link has multi-minute
                # slow phases; a timed slice-0 probe
                # (engine.LINK_MONITOR) re-routes to the transfer-light
                # hybrid route below the ~20 MB/s crossover.  All routes
                # are bit-identical.
                return track.mss_classes_auto(options, nof_labels)
            # Sharded engine (ICI-attached pods: device->host hops are
            # the expensive part, program launches are not): transfer-
            # light routing by track sparsity.
            threshold = _auto_max_runs()
            runs = track.count_runs()
            if runs <= threshold:
                # Sparse track: hybrid device-collapse / host-stack /
                # device-label route (1 B/bp + ~16 B/run off-chip).
                out = apply_mss_candidates(track, options, nof_labels,
                                           runs)
                if out is not None:
                    return out
                # Capacity overflow (hint undercounted): pure device MSS.
                classes_d, maxp_d = track.device()
                return apply_mss_on_device(classes_d, maxp_d, options,
                                           nof_labels, out_len)
            # Noisy track: whole-array host MSS on the fetched track.
            return track.host_mss_classes(options, nof_labels)
        if hasattr(engine, "predict_mss_scores"):
            # Scores are computed inside the engine's fetch workers
            # (overlapping the device->host transfers), and the native MSS
            # emits class ids directly; bit-identical to
            # apply_mss_scored(...).argmax(axis=1) on predict_scored
            # outputs.
            classes, scores = engine.predict_mss_scores(params, onehot)
            return _host_mss_classes(classes, scores, options, nof_labels)
        # engines without the worker-transform path: scored arrays,
        # whole-array transform
        classes, maxp = engine.predict_scored(params, onehot)
        out = apply_mss_scored(classes, maxp, options, nof_labels)
    else:
        out = softmax(engine.predict(params, onehot))
    return np.asanyarray(out.argmax(axis=1))


def setup_prediction_from_options_checkpoint(options: Options,
                                             logdir: PathLike):
    """Rebuild a model and load the latest/best checkpoint weights.

    Returns ``(model, params)`` (prediction.py:68-86 equivalent; JAX has no
    implicit weight state, so parameters are explicit).
    """
    from deepgrp_tpu.train.checkpoint import latest_checkpoint_params

    model = create_model(options)
    params = latest_checkpoint_params(logdir)
    return model, params


def predict_complete(step_size: int, options: Options, logdir: PathLike,
                     data: Data, use_mss: bool = False,
                     params: Optional[dict] = None,
                     compute_dtype=None,
                     rnn_kernel: str = "auto") -> np.ndarray:
    """Restore a model and predict a full sequence
    (prediction.py:114-141 parity).

    Returns one-hot MSS labels when ``use_mss`` else softmaxed
    probabilities, shaped ``[length, n_classes]``.  ``compute_dtype``
    (default float32) and ``rnn_kernel`` select the engine's fast paths —
    HPO sweeps can evaluate in bfloat16 without touching the parity
    default.
    """
    import jax.numpy as jnp

    if params is None:
        model, params = setup_prediction_from_options_checkpoint(
            options, logdir)
    else:
        model = create_model(options)
    engine = PredictionEngine(model, batch_size=options.batch_size,
                              step_size=step_size,
                              compute_dtype=(jnp.float32 if compute_dtype
                                             is None else compute_dtype),
                              rnn_kernel=rnn_kernel)
    output_shape = data.truelbl.shape[::-1]
    predictions = engine.predict(params, np.asarray(data.fwd),
                                 out_len=output_shape[0])
    if use_mss:
        return apply_mss(predictions, options)
    return softmax(predictions)
