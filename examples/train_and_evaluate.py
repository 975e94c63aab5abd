#!/usr/bin/env python3
"""Repeated timed training runs + evaluation (Training.ipynb equivalent).

Trains the tuned configuration (reference defaults.toml) N times, timing
each run, exports the best model of each run, evaluates MCC on the
validation chromosome, and writes ``training_times.csv``.

Usage:
    python examples/train_and_evaluate.py chr11.fa.gz.npz chr20.fa.gz.npz \
        annotations.bed --runs 6 --outdir runs/
"""

import argparse
import csv
import os
import time

import numpy as np

from deepgrp_tpu.config import Options
from deepgrp_tpu.data import preprocess as prep
from deepgrp_tpu.models import create_model
from deepgrp_tpu.models.keras_io import save_model_npz
from deepgrp_tpu.predict import (calculate_metrics, filter_segments,
                                 predict_complete)
from deepgrp_tpu.train.training import training


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
    parser.add_argument("--runs", type=int, default=6)
    parser.add_argument("--outdir", default="runs")
    parser.add_argument("--config", default=None,
                        help="TOML config (default: tuned flagship)")
    args = parser.parse_args()

    if args.config:
        with open(args.config) as f:
            options = Options.from_toml(f)
    else:  # tuned production config (reference defaults.toml values)
        options = Options(vecsize=342, units=60, attention=True,
                          dropout=0.0928, learning_rate=3.787e-3,
                          momentum=0.4324, rho=0.8874,
                          repeat_probability=0.3913)

    train_data = load_chromosome(args.trainfile, args.bedfile,
                                 options.repeats_to_search)
    val_data = load_chromosome(args.validfile, args.bedfile,
                               options.repeats_to_search)

    os.makedirs(args.outdir, exist_ok=True)
    rows = []
    for run in range(args.runs):
        logdir = os.path.join(args.outdir, f"run{run:02d}")
        model = create_model(options)
        t0 = time.perf_counter()
        best_params, history = training((train_data, val_data), options,
                                        model, logdir, seed=run)
        elapsed = time.perf_counter() - t0

        save_model_npz(os.path.join(args.outdir, f"model{run:02d}.npz"),
                       model.config, best_params)
        predictions = predict_complete(50, options, logdir, val_data,
                                       use_mss=True, params=best_params)
        classes = predictions.argmax(axis=1)
        filter_segments(classes, options.min_mss_len)
        _, metrics = calculate_metrics(classes,
                                       val_data.truelbl.argmax(axis=0))
        rows.append({"run": run, "seconds": elapsed,
                     "epochs": len(history["loss"]),
                     "val_loss": min(history["val_loss"]),
                     "MCC": metrics["MCC"]})
        print(rows[-1])

    with open(os.path.join(args.outdir, "training_times.csv"), "w",
              newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0]))
        writer.writeheader()
        writer.writerows(rows)


if __name__ == "__main__":
    main()
