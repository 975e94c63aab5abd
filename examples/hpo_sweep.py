#!/usr/bin/env python3
"""Hyperparameter sweep (DeepGRP.ipynb equivalent).

Runs the published DeepGRP TPE search space with ``results.pkl``
save/resume every ``--save-step`` trials, exactly like the reference
notebook workflow.  With ``--parallel N`` the SAME full space (including
the qnormal vecsize/units architecture dimensions) is swept N proposals
per round, grouped by shape bucket and trained vmapped within each bucket
— the TPU-native fast path.  ``--compare`` additionally times an
equal-sized serial sweep and prints the speedup.

Usage:
    python examples/hpo_sweep.py chr11.fa.gz.npz chr20.fa.gz.npz \
        annotations.bed --trials 100 --save-step 3 --root sweep/
"""

import argparse
import functools
import os
import time

import numpy as np

from deepgrp_tpu.config import Options
from deepgrp_tpu.data import preprocess as prep
from deepgrp_tpu.hpo import build_and_optimize, run_a_trial
from deepgrp_tpu.hpo.bucketed import run_bucketed_sweep
from deepgrp_tpu.hpo.space import reference_search_space


def load_chromosome(npz_path, bedfile, repeats):
    chrom = os.path.basename(npz_path).split(".")[0]
    fwd = np.load(npz_path, allow_pickle=False)["fwd"]
    labels = prep.preprocess_y(bedfile, chrom, fwd.shape[1], repeats)
    fwd, labels = prep.drop_start_end_n(fwd, labels)
    return prep.Data(fwd=fwd, truelbl=labels)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("trainfile")
    parser.add_argument("validfile")
    parser.add_argument("bedfile")
    parser.add_argument("--trials", type=int, default=100)
    parser.add_argument("--save-step", type=int, default=3)
    parser.add_argument("--root", default="sweep")
    parser.add_argument("--step-size", type=int, default=50)
    parser.add_argument("--parallel", type=int, default=0,
                        help="TPE proposals per round, trained vmapped "
                        "within shape buckets (0 = serial TPE)")
    parser.add_argument("--compare", action="store_true",
                        help="with --parallel: also time an equal serial "
                        "sweep and print the speedup")
    parser.add_argument("--config", default=None,
                        help="TOML base config (default: reference defaults)")
    parser.add_argument("--space", choices=["reference", "quick"],
                        default="reference",
                        help="'quick' varies only learning_rate/dropout "
                        "(keeps the base architecture; fast smoke sweeps)")
    args = parser.parse_args()

    if args.config:
        with open(args.config) as f:
            options = Options.from_toml(f)
        options.project_root_dir = args.root
    else:
        options = Options(project_root_dir=args.root)
    train_data = load_chromosome(args.trainfile, args.bedfile,
                                 options.repeats_to_search)
    val_data = load_chromosome(args.validfile, args.bedfile,
                               options.repeats_to_search)
    os.makedirs(args.root, exist_ok=True)

    if args.parallel:
        space = reference_search_space()
        start = time.perf_counter()
        trials = run_bucketed_sweep(space, options, train_data, val_data,
                                    args.step_size, args.root,
                                    max_evals=args.trials,
                                    batch_evals=args.parallel, seed=0)
        parallel_s = time.perf_counter() - start
        best = trials.best_trial()
        print(f"bucketed sweep: {len(trials)} trials in {parallel_s:.1f}s; "
              f"best loss {best['result']['loss'] if best else 'n/a'}")
        if args.compare:
            objective = functools.partial(build_and_optimize, train_data,
                                          val_data, args.step_size, options)
            serial_root = os.path.join(args.root, "serial_baseline")
            os.makedirs(serial_root, exist_ok=True)
            start = time.perf_counter()
            run_a_trial(reference_search_space(), objective, serial_root,
                        args.trials, seed=0)
            serial_s = time.perf_counter() - start
            print(f"serial sweep: {args.trials} trials in {serial_s:.1f}s "
                  f"-> bucketed speedup {serial_s / parallel_s:.2f}x")
        return

    objective = functools.partial(build_and_optimize, train_data, val_data,
                                  args.step_size, options)
    if args.space == "quick":
        from deepgrp_tpu.hpo.space import lognormal, uniform
        space = {"learning_rate": lognormal("learning_rate", -5, 1.0),
                 "dropout": uniform("dropout", 0, 0.3)}
    else:
        space = reference_search_space()
    done = 0
    while done < args.trials:
        # save/resume every save_step trials (notebook workflow)
        done = run_a_trial(space, objective, args.root,
                           min(args.save_step, args.trials - done))
        print(f"{done} trials complete")


if __name__ == "__main__":
    main()
