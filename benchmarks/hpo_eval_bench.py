#!/usr/bin/env python3
"""Sweep-evaluation transport bench: scored path vs legacy full matrix.

VERDICT r4 item 5 acceptance artifact.  Times `evaluate_trained` (the
inner loop of every HPO sweep trial, now routed through the production
scored transport, ~5 B/bp) against the legacy reference-shaped
`predict_complete` -> apply_mss -> argmax chain (~40+ B/bp) on the
trained flagship fixture over a ~2 Mbp validation chromosome,
interleaved (weather-fair), asserting every returned metric is
IDENTICAL.  Writes benchmarks/hpo_eval_bench.json.

Usage (TPU host):  python benchmarks/hpo_eval_bench.py
"""
import os, sys, time, json
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); sys.path.insert(0, os.path.join(REPO, "tests"))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import synth_mbp
from deepgrp_tpu.config import Options
from deepgrp_tpu.data.preprocess import Data
from deepgrp_tpu.models.keras_io import load_model
from deepgrp_tpu.models.model import DeepGRPModel
from deepgrp_tpu.hpo.optimization import evaluate_trained
from deepgrp_tpu.predict.postprocess import predict_complete, predict_sequence
from deepgrp_tpu.predict.engine import PredictionEngine
from deepgrp_tpu.ops.segments import filter_segments
from deepgrp_tpu.predict.metrics import calculate_metrics
from deepgrp_tpu.ops.encoding import encode_codes_trimmed

config, params = load_model(os.path.join(REPO, "tests", "fixtures", "reference", "gru_att.h5"))
model = DeepGRPModel(config)
params = jax.device_put(params)
options = Options(vecsize=config.vecsize, units=config.units, attention=True, batch_size=256)
n_win = (2_000_000 - config.vecsize) // 50 + 1
seq = synth_mbp.make_mbp_sequence(7, n_win)
_, codes = encode_codes_trimmed(seq)
L = codes.shape[-1]
fwd = np.zeros((5, L), np.int8); fwd[codes, np.arange(L)] = 1
rng = np.random.default_rng(0)
truelbl = np.zeros((5, L), np.int8)
for c in range(1, 5):
    for _ in range(50):
        s = int(rng.integers(0, L - 3000)); truelbl[c, s:s+2500] = 1
truelbl[0] = truelbl[1:].sum(axis=0) == 0
val = Data(fwd=fwd, truelbl=truelbl)

def legacy_classes():
    predictions = predict_complete(50, options, "/tmp", val, use_mss=True, params=params)
    is_not_na = np.logical_not(np.isnan(predictions[:, 0]))
    cls = predictions[is_not_na].argmax(axis=1)
    filter_segments(cls, options.min_mss_len)
    return cls, is_not_na

def legacy_metrics():
    cls, mask = legacy_classes()
    return calculate_metrics(cls, val.truelbl[:, mask].argmax(axis=0))[1]

m_new = evaluate_trained(options, 50, "/tmp", val, params)
m_old = legacy_metrics()
keys_equal = {}
for k in m_old:
    a, b = np.asarray(m_new[k], float), np.asarray(m_old[k], float)
    keys_equal[k] = bool(np.array_equal(a, b) or np.allclose(a, b, equal_nan=True, rtol=0, atol=0))
print("metric equality:", keys_equal)
print("MCC scored:", m_new["MCC"], "legacy:", m_old["MCC"])
t_old, t_new = [], []
for rep in range(3):
    t0 = time.perf_counter(); evaluate_trained(options, 50, "/tmp", val, params); t_new.append(time.perf_counter()-t0)
    t0 = time.perf_counter(); legacy_metrics(); t_old.append(time.perf_counter()-t0)
    print(f"rep{rep}: scored={t_new[-1]:.2f}s legacy={t_old[-1]:.2f}s", flush=True)
out = {"date": time.strftime("%Y-%m-%dT%H:%M:%S"), "seq_len": int(L),
       "scored_transport_s": sorted(round(t,3) for t in t_new),
       "legacy_full_matrix_s": sorted(round(t,3) for t in t_old),
       "speedup": round(min(t_old)/min(t_new), 2),
       "mcc_scored": float(np.asarray(m_new["MCC"], float)),
       "mcc_legacy": float(np.asarray(m_old["MCC"], float)),
       "all_metrics_identical": all(keys_equal.values())}
json.dump(out, open(os.path.join(REPO, "benchmarks", "hpo_eval_bench.json"),"w"), indent=2)
print(json.dumps(out))
