#!/usr/bin/env python3
"""Hyperparameter sweep (DeepGRP.ipynb equivalent).

Runs the published DeepGRP TPE search space with ``results.pkl``
save/resume every ``--save-step`` trials, exactly like the reference
notebook workflow.  With ``--parallel N`` the continuous dimensions
(learning_rate, momentum, rho, dropout) are instead swept N-at-a-time
under one vmapped train step (vecsize/units fixed to the tuned values) —
the TPU-native fast path.

Usage:
    python examples/hpo_sweep.py chr11.fa.gz.npz chr20.fa.gz.npz \
        annotations.bed --trials 100 --save-step 3 --root sweep/
"""

import argparse
import functools
import os

import numpy as np

from deepgrp_tpu.config import Options
from deepgrp_tpu.data import preprocess as prep
from deepgrp_tpu.hpo import build_and_optimize, run_a_trial
from deepgrp_tpu.hpo.space import reference_search_space, sample_space
from deepgrp_tpu.hpo.vmapped import run_parallel_trials


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
                        help="N simultaneous vmapped trials (0 = TPE)")
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
        base = Options(vecsize=342, units=60, attention=True,
                       project_root_dir=args.root)
        space = reference_search_space()
        rng = np.random.default_rng(0)
        trial_dicts = []
        for _ in range(args.parallel):
            sample = sample_space(space, rng)
            trial_dicts.append({k: sample[k] for k in
                                ("learning_rate", "momentum", "rho",
                                 "dropout")})
        results = run_parallel_trials(base, trial_dicts, train_data,
                                      val_data)
        for trial, result in zip(trial_dicts, results):
            print(trial, "->", result["val_loss"])
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
