"""Command-line interface.

Flag and behavior parity with the reference ``deepgrp`` CLI
(``/root/reference/deepgrp/__main__.py:86-356``): global flags
``--batch_size/-b --step_size/-s --xdrop_length/-x --min_mss_length/-l
--threads/-t --xla -v`` and the ``train`` / ``predict`` subcommands with the
same arguments, defaults and output format
(``filename\\theader\\tstart\\tend\\tlabel`` rows for label > 0 segments).

Parity-preserved quirks:
  * ``predict`` takes ``vecsize`` from the model file's input shape
    (__main__.py:270),
  * ``train`` applies the CLI-built Options dict over the TOML file —
    which, as in the reference, overwrites every TOML value with
    defaults + CLI flags (__main__.py:309-311; SURVEY §5 documents this
    precedence bug; ``--honor-toml`` opts out),
  * ``--xla`` is accepted but a no-op: everything is XLA-compiled here.

``--threads`` bounds host-side CPU parallelism (it mapped to TF's thread
pools in the reference, __main__.py:221-233).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import List, Optional

import numpy as np

_LOG = logging.getLogger("deepgrp_tpu")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="deepgrp_tpu",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description="DeepGRP-TPU - Prediction of repetitive elements")
    from deepgrp_tpu import __version__

    parser.add_argument("--version", action="version",
                        version=f"%(prog)s {__version__}")
    parser.add_argument("--batch_size", "-b", type=int, default=256,
                        help="Batch size to use for prediction")
    parser.add_argument("--step_size", "-s", type=int, default=50,
                        help="Window step size")
    parser.add_argument("--xdrop_length", "-x", type=int, default=50,
                        help="XDrop parameter for MSS algorithm, ignored if "
                        "--no_use_mss, disabled with values<0")
    parser.add_argument("--min_mss_length", "-l", type=int, default=50,
                        help="Minimal length of maximum scoring segments, "
                        "ignored if --no_use_mss")
    parser.add_argument("--threads", "-t", type=int, default=1,
                        help="Number of host threads (all=0)")
    parser.add_argument("--xla", action="store_true",
                        help="Accepted for compatibility (always XLA)")
    parser.add_argument("-v", "--verbose", action="count", default=0,
                        help="Increase verbosity")
    parser.add_argument("--precision", choices=["float32", "bfloat16"],
                        default="float32",
                        help="Inference compute dtype (float32 matches the "
                        "reference bit-for-bit; bfloat16 is faster)")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="Capture a JAX profiler trace into DIR "
                        "(view with TensorBoard/Perfetto)")
    parser.add_argument("--compile-cache", type=str, default=None,
                        metavar="DIR",
                        help="Persistent XLA compilation cache directory "
                        "(default: $XDG_CACHE_HOME/deepgrp_tpu/jax — the "
                        "big scan programs take minutes to compile on TPU "
                        "but cache across processes; 'off' disables)")
    parser.add_argument("--rnn-kernel", choices=["auto", "scan", "fused"],
                        default="auto",
                        help="Recurrence implementation: 'scan' (XLA), "
                        "'fused' (Pallas fwd+revcomp recurrence kernel; "
                        "bitwise reference parity in float32), 'auto' "
                        "(fused on TPU, scan elsewhere)")
    parser.add_argument("--coordinator", type=str, default=None,
                        metavar="HOST:PORT",
                        help="Multi-host launch: jax.distributed "
                        "coordinator address (pair with --num-processes "
                        "and --process-id; on TPU pods all three usually "
                        "come from the environment)")
    parser.add_argument("--num-processes", type=int, default=None,
                        help="Multi-host launch: total process count")
    parser.add_argument("--process-id", type=int, default=None,
                        help="Multi-host launch: this process's rank")

    subparsers = parser.add_subparsers(help="sub-command help",
                                       dest="command")

    train = subparsers.add_parser(
        name="train",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description="Train a deepgrp model")
    train.add_argument("parameter", type=str,
                       help="toml file with parameters")
    train.add_argument("trainfile", type=str,
                       help="Training data preprocessed with "
                       "'preprocess_sequence'")
    train.add_argument("validfile", type=str,
                       help="Validation data preprocessed with "
                       "'preprocess_sequence'")
    train.add_argument("bedfile", type=str,
                       help="Ground truth repeat annotation data.")
    train.add_argument("--logdir", type=str, default=".",
                       help="Directory for log / checkpoint files.")
    train.add_argument("--modelfile", type=str, default="model.npz",
                       help="Output path for the model file.")
    train.add_argument("--honor-toml", action="store_true",
                       help="Let TOML values win over CLI defaults (the "
                       "reference overwrites TOML with defaults)")
    train.add_argument("--mesh", choices=["auto", "off"], default="auto",
                       help="Data-parallel training across all visible "
                       "devices (auto: when more than one device and the "
                       "batch size divides evenly)")
    train.add_argument("--tensorboard", action=argparse.BooleanOptionalAction,
                       default=True,
                       help="Write TensorBoard event files next to "
                       "metrics.jsonl (reference parity: always on, "
                       "training.py:40-45)")

    predict = subparsers.add_parser(
        name="predict",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description="predict using a deepgrp model")
    predict.add_argument("model", type=str,
                         help="Model file (.npz native or Keras .h5/.hdf5)")
    predict.add_argument("FASTA", nargs="+", type=str,
                         help="Fasta input files ('-' for stdin)")
    predict.add_argument("--output", type=str, default="-",
                         help="Output filename")
    predict.add_argument("--no_use_mss", "-m", action="store_true",
                         help="Disable maximum scoring segment algorithm")
    predict.add_argument("--mesh", choices=["auto", "off"], default="auto",
                         help="Shard the window stream across all visible "
                         "devices (auto: when more than one device)")
    predict.add_argument("--device-mss", nargs="?", const="on",
                         choices=["auto", "on", "off"], default="auto",
                         help="MSS post-processing placement: 'auto' "
                         "(default) uses the measured-best route — the "
                         "streaming host MSS (overlapped with transfers) "
                         "on a single device, sparsity-based transfer-"
                         "light routing on a sharded mesh; 'on' forces "
                         "all-on-chip (for very slow host links), 'off' "
                         "forces the plain host path")
    return parser


def set_logging(verbose: int) -> None:
    loglevels = [logging.WARNING, logging.INFO, logging.DEBUG]
    logging.basicConfig()
    _LOG.setLevel(loglevels[min(len(loglevels) - 1, verbose)])


def setup_distributed(args: argparse.Namespace) -> None:
    """Join a multi-host job when any launch flag is given.

    Calls ``parallel.mesh.initialize_distributed`` (which RAISES on real
    init failures — a job cannot silently degrade to single-host) before
    any jax backend use, so ``jax.devices()`` sees the whole pod and the
    ``--mesh auto`` engines shard globally.  SURVEY §7 step 6 / north-star
    "N>=2 hosts"; the reference CLI is single-process
    (__main__.py:221-233).
    """
    if (args.coordinator is None and args.num_processes is None
            and args.process_id is None):
        return
    from deepgrp_tpu.parallel.mesh import initialize_distributed

    kwargs = {}
    if args.coordinator is not None:
        kwargs["coordinator_address"] = args.coordinator
    if args.num_processes is not None:
        kwargs["num_processes"] = args.num_processes
    if args.process_id is not None:
        kwargs["process_id"] = args.process_id
    initialize_distributed(**kwargs)
    import jax

    _LOG.info("joined distributed job: process %d/%d, %d global devices",
              jax.process_index(), jax.process_count(), len(jax.devices()))


def setup_runtime(threads: int) -> None:
    """Bound host-side compute threads (TPU compute is unaffected).

    ``--threads N>0`` caps the native MSS worker pool at N (reference
    semantics: the flag sized TF's host pools); ``--threads 0`` = all.
    XLA's own host thread pool is deliberately NOT capped: on a
    multi-device CPU mesh (tests, simulations) a pool smaller than the
    device count deadlocks cross-replica collectives mid-AllReduce.
    """
    from deepgrp_tpu.ops.mss import set_default_threads

    if threads > 0:
        set_default_threads(threads)


def options_from_args(args: argparse.Namespace):
    from deepgrp_tpu.config import Options

    # Same trio of CLI-sourced options as the reference (__main__.py:245-249).
    return Options(min_mss_len=args.min_mss_length,
                   batch_size=args.batch_size,
                   xdrop_len=args.xdrop_length)


def _apply_jax_flags(args: argparse.Namespace) -> None:
    import jax

    cache_dir = args.compile_cache
    if cache_dir is None:
        # On by default: the chunk-scan programs take minutes to compile
        # on TPU and the cache keys are process-stable (verified,
        # benchmarks/cache_probe.json) — a fresh CLI process reaches its
        # first result in seconds instead.
        base = os.environ.get("XDG_CACHE_HOME",
                              os.path.join(os.path.expanduser("~"),
                                           ".cache"))
        cache_dir = os.path.join(base, "deepgrp_tpu", "jax")
    if cache_dir and cache_dir != "off":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.verbose >= 2:
        # Device-placement debug parity (reference __main__.py:235-241 maps
        # -vv to tf.debugging.set_log_device_placement): report the backend
        # and device roster, and have XLA log every compiled computation.
        _LOG.debug("backend=%s process=%d/%d", jax.default_backend(),
                   jax.process_index(), jax.process_count())
        for dev in jax.devices():
            _LOG.debug("device %s: platform=%s host=%d", dev,
                       dev.platform, dev.process_index)
        jax.config.update("jax_log_compiles", True)
    if args.profile:
        jax.profiler.start_trace(args.profile)


def _stop_profile(args: argparse.Namespace) -> None:
    if args.profile:
        import jax

        jax.profiler.stop_trace()
        _LOG.info("profiler trace written to %s", args.profile)


def cmd_predict(args: argparse.Namespace, options) -> None:
    import jax
    import jax.numpy as jnp

    from deepgrp_tpu.data.fasta import read_multi_fasta
    from deepgrp_tpu.models.keras_io import load_model
    from deepgrp_tpu.models.model import DeepGRPModel
    from deepgrp_tpu.ops.encoding import encode_codes_trimmed
    from deepgrp_tpu.ops.segments import yield_segments
    from deepgrp_tpu.predict.engine import PredictionEngine
    from deepgrp_tpu.predict.postprocess import predict_sequence

    _apply_jax_flags(args)
    _LOG.debug("Loading model %s", args.model)
    config, params = load_model(args.model)
    options.vecsize = config.vecsize  # vecsize from the model (parity)
    model = DeepGRPModel(config)
    params = jax.device_put(params)
    _LOG.info("Model loading finished successfully!")

    dtype = jnp.bfloat16 if args.precision == "bfloat16" else jnp.float32
    if args.mesh == "auto" and len(jax.devices()) > 1:
        from deepgrp_tpu.parallel import ShardedPredictionEngine, make_mesh

        _LOG.info("sharding windows across %d devices", len(jax.devices()))
        engine = ShardedPredictionEngine(model, make_mesh(),
                                         batch_size=options.batch_size,
                                         step_size=args.step_size,
                                         compute_dtype=dtype,
                                         rnn_kernel=args.rnn_kernel)
    else:
        engine = PredictionEngine(model, batch_size=options.batch_size,
                                  step_size=args.step_size,
                                  compute_dtype=dtype,
                                  rnn_kernel=args.rnn_kernel)

    # Multi-host: every process computes (the sharded engine all-gathers
    # results), but only process 0 emits the BED stream.
    if jax.process_index() == 0:
        outstream = (sys.stdout if args.output == "-"
                     else open(args.output, "w"))
    else:
        outstream = open(os.devnull, "w")
    try:
        for filename in args.FASTA:
            _LOG.info("Processing %s", filename)
            filestream = sys.stdin if filename == "-" else open(filename)
            try:
                for header, dnasequence in read_multi_fasta(filestream):
                    # Compact codes: 5x less host->device transfer and
                    # 5x less HBM; both engines expand to one-hot on
                    # device per chunk.
                    startpos, onehot = encode_codes_trimmed(dnasequence)
                    device_mss = {"on": True, "off": False}.get(
                        getattr(args, "device_mss", "auto"), "auto")
                    predictions = predict_sequence(
                        model, params, onehot, options, args.step_size,
                        use_mss=not args.no_use_mss, engine=engine,
                        device_mss=device_mss)
                    for segment in yield_segments(predictions, startpos):
                        if segment[2] > 0:
                            outstream.write("{}\t{}\t{}\t{}\t{}\n".format(
                                filename, header, *segment))
            finally:
                if filename != "-":
                    filestream.close()
    finally:
        if outstream is not sys.stdout:
            outstream.close()
        _stop_profile(args)


def cmd_train(args: argparse.Namespace, options) -> None:
    _apply_jax_flags(args)
    from deepgrp_tpu.config import Options
    from deepgrp_tpu.data import preprocess as dgpreprocess
    from deepgrp_tpu.models.keras_io import save_model_h5, save_model_npz
    from deepgrp_tpu.models.model import create_model
    from deepgrp_tpu.train.training import training

    with open(args.parameter) as file:
        parameter = Options.from_toml(file)
    if not args.honor_toml:
        # Reference precedence: the full CLI Options dict (defaults + the
        # three CLI flags) overwrites the TOML values (__main__.py:309-311).
        parameter.fromdict(options.todict())
    else:
        parameter.min_mss_len = options.min_mss_len
        parameter.batch_size = options.batch_size
        parameter.xdrop_len = options.xdrop_len

    train_chr = os.path.basename(args.trainfile).split(".")[0]
    val_chr = os.path.basename(args.validfile).split(".")[0]

    if not os.path.isdir(args.logdir):
        os.mkdir(args.logdir)

    _LOG.info("Loading in all data necessary from %s, %s, %s",
              args.trainfile, args.validfile, args.bedfile)
    train_fwd = np.load(args.trainfile, allow_pickle=False)["fwd"]
    val_fwd = np.load(args.validfile, allow_pickle=False)["fwd"]

    y_train = dgpreprocess.preprocess_y(args.bedfile, train_chr,
                                        train_fwd.shape[1],
                                        parameter.repeats_to_search)
    y_val = dgpreprocess.preprocess_y(args.bedfile, val_chr,
                                      val_fwd.shape[1],
                                      parameter.repeats_to_search)

    train_fwd, y_train = dgpreprocess.drop_start_end_n(train_fwd, y_train)
    val_fwd, y_val = dgpreprocess.drop_start_end_n(val_fwd, y_val)
    train_data = dgpreprocess.Data(train_fwd, y_train)
    val_data = dgpreprocess.Data(val_fwd, y_val)

    mesh = None
    if getattr(args, "mesh", "off") == "auto":
        import jax

        n_dev = len(jax.devices())
        if n_dev > 1:
            if parameter.batch_size % n_dev:
                _LOG.warning(
                    "batch_size %d not divisible by %d devices; training "
                    "single-device", parameter.batch_size, n_dev)
            else:
                from deepgrp_tpu.parallel import make_mesh

                mesh = make_mesh()
                _LOG.info("data-parallel training over %d devices", n_dev)

    _LOG.info("Creating model for training")
    model = create_model(parameter)
    _LOG.info("Training Model")
    best_params, _ = training((train_data, val_data), parameter, model,
                              args.logdir, mesh=mesh,
                              tensorboard=args.tensorboard,
                              rnn_kernel=args.rnn_kernel)

    _LOG.info("Saving model as %s", args.modelfile)
    if args.modelfile.endswith((".h5", ".hdf5")):
        # Reference-consumable whole-model HDF5 (the reference CLI's
        # default artifact, __main__.py:349-351).
        save_model_h5(args.modelfile, model.config, best_params)
    else:
        save_model_npz(args.modelfile, model.config, best_params)
    _stop_profile(args)


def main(argv: Optional[List[str]] = None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.command is None:
        parser.print_help()
        sys.exit(2)
    set_logging(args.verbose)
    setup_distributed(args)
    setup_runtime(args.threads)
    options = options_from_args(args)
    if args.command == "train":
        cmd_train(args, options)
    else:
        cmd_predict(args, options)


if __name__ == "__main__":  # pragma: no cover
    main()
