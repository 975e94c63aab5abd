"""Generate reference-parity fixtures from the ACTUAL reference TF model.

Run manually (TF required):  python tests/gen_reference_fixtures.py

This script is the one place where the real reference implementation
(/root/reference, TF2/Keras) is executed.  For each architecture the
reference can build (GRU+attention flagship, plain GRU, LSTM —
model.py:293-336) it:

  1. builds the reference Keras model via ``deepgrp.model.create_model``
     (with ``tf_keras`` / ``TF_USE_LEGACY_KERAS=1``, the Keras-2 era the
     reference targets),
  2. trains it briefly on synthetic planted-repeat data so the output
     probabilities are decisive (bitwise BED parity is meaningless on
     near-uniform random-weight outputs),
  3. saves the whole-model HDF5 exactly as the reference CLI does
     (``model.save(...)``, __main__.py:349-351),
  4. runs the REFERENCE prediction pipeline — reference model
     ``predict_on_batch`` + the reference C kernels compiled as oracles
     (maxcalc.c overlap-max merge, mss.c Ruzzo-Tompa) + a literal
     transliteration of the reference Cython labeling/segment iteration
     (pymss.pyx:29-80, sequence.pyx:40-53,79-85) — over a multi-record
     FASTA, producing the expected BED rows (__main__.py:288-292 format,
     filename column omitted),
  5. writes fixtures consumed by tests/test_reference_parity.py:
     ``{name}.h5``, ``{name}.fa``, ``{name}.bed``, ``{name}_probs.npy``
     (reference forward probabilities for the first windows), and
     ``manifest.json``.

Partial-batch note: the reference merge loop computes the write offset as
``i * batch.shape[0] * step_size`` (prediction.py:104-106), which misplaces
the final PARTIAL batch (its smaller shape shrinks the offset).  Our engine
deliberately fixes this.  Records are therefore sized so the window count is
an exact multiple of the batch size (buggy == fixed, true bitwise parity —
asserted below), plus one partial-batch record per config whose expected BED
uses the corrected offset, documenting the intentional divergence.
"""

# Environment must be configured before TF/JAX import.
import os
import sys

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")  # reference-era Keras 2
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")  # deterministic numerics
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import json
import math
import types

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_FIXDIR = os.path.join(_HERE, "fixtures", "reference")
_REFROOT = "/root/reference"

sys.path.insert(0, _HERE)

from reference_oracle import (load_reference_lib, reference_get_max,
                              reference_mss_find_all)

# ---------------------------------------------------------------------------
# toml shim: the reference imports `toml`, absent here; it only needs
# load/loads (tomllib covers those) and dump/dumps (not used by this script).


def _install_toml_shim() -> None:
    import tomllib

    shim = types.ModuleType("toml")
    shim.load = lambda f: tomllib.loads(f.read())
    shim.loads = tomllib.loads

    def _dump_not_needed(*_a, **_k):  # pragma: no cover
        raise NotImplementedError("toml.dump not available in shim")

    shim.dump = _dump_not_needed
    shim.dumps = _dump_not_needed
    sys.modules.setdefault("toml", shim)


_install_toml_shim()
sys.path.insert(0, _REFROOT)

import deepgrp.model as refmodel  # noqa: E402  (the actual reference)

# ---------------------------------------------------------------------------
# Reference pipeline transliterations (host-side spec, independent of the
# deepgrp_tpu package so the fixture side is self-contained).

_LUT = np.full(256, 4, dtype=np.int64)
for _b, _c in (("Aa", 0), ("Cc", 1), ("Gg", 2), ("Tt", 3)):
    for _ch in _b:
        _LUT[ord(_ch)] = _c


def ref_one_hot(sequence: str):
    """sequence.pyx:21-36: LUT encode, trim leading/trailing 'N' chars."""
    raw = sequence.encode("utf-8")
    arr = np.frombuffer(raw, dtype=np.uint8)
    start, end = 0, len(arr)
    while start < end and arr[start] == ord("N"):
        start += 1
    while end > 0 and arr[end - 1] == ord("N"):
        end -= 1
    codes = _LUT[arr[start:end]]
    fwd = np.zeros((5, codes.size), dtype=np.int8)
    fwd[codes, np.arange(codes.size)] = 1
    return start, fwd


def ref_find_mss_labels(scores, label, nof_labels, min_mss_len, xdrop_len):
    """pymss.pyx:29-80: Ruzzo-Tompa (oracle C) + majority-vote labeling."""
    s0 = math.log(0.99 / (1.0 - 0.99))
    xdrop = s0 * xdrop_len * 10.0 if xdrop_len > 0 else -1.0
    min_sc = s0 * min_mss_len
    segs = reference_mss_find_all(np.asarray(scores, np.float64), min_sc,
                                  xdrop)
    out = np.zeros((len(scores), nof_labels))
    label = np.asarray(label, np.int64)
    pos = 0
    for st, en, _sc in segs:
        counts = np.bincount(label[st:en], minlength=nof_labels)
        max_idx = 1 + int(np.argmax(counts[1:]))  # ties -> lowest index
        seg = label[st:en]
        idx = np.arange(st, en)
        out[idx[seg == 0], max_idx] = 1
        out[idx[seg != 0], seg[seg != 0]] = 1
        before = np.arange(pos, st)
        out[before, label[pos:st]] = 1
        pos = en
    tail = np.arange(pos, len(scores))
    out[tail, label[pos:]] = 1
    return out


def ref_apply_mss(probs, min_mss_len, xdrop_len):
    """prediction.py:40-59."""
    nof_labels = probs.shape[1]
    classes = probs.argmax(axis=1)
    mins = probs.max(axis=1) + 1e-6
    mins[mins > 0.99] = 0.99
    t_scores = np.log(mins / (1 - mins))
    scores = np.where(classes > 0, t_scores, -10 * t_scores).astype(float)
    return ref_find_mss_labels(scores, classes, nof_labels, min_mss_len,
                               xdrop_len)


def ref_get_segments(classes, startpos):
    """sequence.pyx:40-53 (including the size-1 last-element quirk)."""
    length = classes.size - 1
    currentlabel = classes[startpos]
    while startpos < length and currentlabel == 0:
        startpos += 1
        currentlabel = classes[startpos]
    end = startpos + 1
    while end < length and classes[end] == currentlabel:
        end += 1
    return startpos, end, currentlabel


def ref_yield_segments(classes, start_offset):
    """sequence.pyx:79-85."""
    i = 0
    while i < classes.size:
        start, end, label = ref_get_segments(classes, i)
        i = end
        yield start + start_offset, end + start_offset, label


def ref_windows(onehot, vecsize, step):
    """prediction.py:14-37 window enumeration: range(0, L - vecsize, step)."""
    data = onehot.T.astype(np.float32)
    return [data[s:s + vecsize] for s in range(0, data.shape[0] - vecsize,
                                               step)]


def ref_predict_merged(model, onehot, vecsize, step, batch_size,
                       n_classes, fixed_offset):
    """prediction.py:89-111 merge loop.

    ``fixed_offset=False`` reproduces the reference's partial-batch offset
    bug verbatim; ``True`` uses the corrected offset our engine implements.
    """
    windows = ref_windows(onehot, vecsize, step)
    preds = np.zeros((onehot.shape[1], n_classes), dtype=np.float32)
    for i, bstart in enumerate(range(0, len(windows), batch_size)):
        batch = np.stack(windows[bstart:bstart + batch_size])
        probas = np.ascontiguousarray(
            np.asarray(model.predict_on_batch(batch)), dtype=np.float32)
        if fixed_offset:
            index = bstart * step
        else:
            index = i * batch.shape[0] * step  # the reference's expression
        reference_get_max(preds[index:], probas, step)
    return preds


def ref_pipeline_bed(model, header, sequence, vecsize, step, batch_size,
                     n_classes, min_mss_len, xdrop_len, fixed_offset):
    """__main__.py:46-83 + :288-292: sequence -> BED rows (no filename)."""
    startpos, onehot = ref_one_hot(sequence)
    merged = ref_predict_merged(model, onehot, vecsize, step, batch_size,
                                n_classes, fixed_offset)
    labeled = ref_apply_mss(merged, min_mss_len, xdrop_len)
    classes = np.asanyarray(labeled.argmax(axis=1))
    rows = []
    for seg in ref_yield_segments(classes, startpos):
        if seg[2] > 0:
            rows.append("{}\t{}\t{}\t{}".format(header, *seg))
    return rows, merged


# ---------------------------------------------------------------------------
# Synthetic planted-repeat data.

_BASES = np.array(list("ACGT"))


def _make_motifs(rng):
    """Class 1..4 motifs (HSAT-like GGAAT tandem + three fixed motifs)."""
    return {
        1: "GGAAT",
        2: "".join(rng.choice(_BASES, size=29)),
        3: "".join(rng.choice(_BASES, size=47)),
        4: "".join(rng.choice(_BASES, size=61)),
    }


def synth_genome(rng, length, motifs, coverage=0.3):
    """Random ACGT background with planted tandem-repeat segments."""
    seq = rng.choice(_BASES, size=length)
    labels = np.zeros(length, dtype=np.int64)
    target = int(length * coverage)
    planted = 0
    while planted < target:
        cls = int(rng.integers(1, 5))
        seg_len = int(rng.integers(250, 800))
        start = int(rng.integers(0, length - seg_len))
        if labels[start:start + seg_len].any():
            continue
        motif = motifs[cls]
        tiled = (motif * (seg_len // len(motif) + 1))[:seg_len]
        seq[start:start + seg_len] = list(tiled)
        labels[start:start + seg_len] = cls
        planted += seg_len
    return "".join(seq), labels


def training_windows(rng, seq, labels, vecsize, n_per_class, n_background,
                     n_classes):
    """Class-balanced window sampling for the brief fixture training run."""
    _, onehot = ref_one_hot(seq)
    data = onehot.T.astype(np.float32)
    ydata = np.zeros((len(labels), n_classes), dtype=np.float32)
    ydata[np.arange(len(labels)), labels] = 1.0
    starts = []
    for cls in range(1, n_classes):
        pos = np.flatnonzero(labels == cls)
        pos = pos[(pos > vecsize) & (pos < len(labels) - vecsize)]
        chosen = rng.choice(pos, size=n_per_class, replace=True)
        starts.extend(int(p) - int(rng.integers(0, vecsize)) for p in chosen)
    starts.extend(
        int(s) for s in rng.integers(0, len(labels) - vecsize,
                                     size=n_background))
    starts = np.clip(np.array(starts), 0, len(labels) - vecsize)
    rng.shuffle(starts)
    x = np.stack([data[s:s + vecsize] for s in starts])
    y = np.stack([ydata[s:s + vecsize] for s in starts])
    return x, y


def eval_record(rng, motifs, core_len, lead_n, trail_n, internal_n=0):
    """One FASTA record: planted-repeat core wrapped in N padding."""
    seq, _ = synth_genome(rng, core_len, motifs, coverage=0.35)
    seq = list(seq)
    if internal_n:
        mid = core_len // 2
        # Internal N run (encoded as channel 4, not trimmed).
        seq[mid:mid + internal_n] = ["N"] * internal_n
    return "N" * lead_n + "".join(seq) + "N" * trail_n


def core_len_for_windows(vecsize, step, n_windows):
    """Trimmed length whose window count is exactly ``n_windows``."""
    # len(range(0, L - vecsize, step)) == ceil((L - vecsize)/step)
    return vecsize + step * n_windows


# ---------------------------------------------------------------------------

CONFIGS = {
    # The flagship tuned architecture (defaults.toml:1-19).
    "gru_att": dict(vecsize=342, units=60, rnn="GRU", attention=True,
                    dropout=0.0928, seed=11),
    "gru": dict(vecsize=150, units=32, rnn="GRU", attention=False,
                dropout=0.1, seed=22),
    "lstm": dict(vecsize=150, units=32, rnn="LSTM", attention=False,
                 dropout=0.1, seed=33),
}

STEP = 50
BATCH = 64
MIN_MSS_LEN = 50
XDROP_LEN = 50
N_CLASSES = 5
N_PROB_WINDOWS = 8


def wrap_fasta(records):
    lines = []
    for header, seq in records:
        lines.append(">" + header)
        for i in range(0, len(seq), 70):
            chunk = seq[i:i + 70]
            # Exercise the reference's per-line .upper() (__main__.py:33-41).
            if (i // 70) % 5 == 3:
                chunk = chunk.lower()
            lines.append(chunk)
    return "\n".join(lines) + "\n"


def build_and_train(name, cfg, rng, motifs, train_seq, train_labels):
    import tensorflow as tf

    tf.keras.utils.set_random_seed(cfg["seed"])
    options = refmodel.Options(vecsize=cfg["vecsize"], units=cfg["units"],
                               rnn=cfg["rnn"], attention=cfg["attention"],
                               dropout=cfg["dropout"])
    model = refmodel.create_model(options)
    x, y = training_windows(rng, train_seq, train_labels, cfg["vecsize"],
                            n_per_class=384, n_background=512, n_classes=5)
    model.fit(x, y, batch_size=64, epochs=8, verbose=2)
    return model


def main():
    assert load_reference_lib() is not None, "oracle C kernels required"
    os.makedirs(_FIXDIR, exist_ok=True)

    manifest = {"step_size": STEP, "batch_size": BATCH,
                "min_mss_len": MIN_MSS_LEN, "xdrop_len": XDROP_LEN,
                "n_prob_windows": N_PROB_WINDOWS, "configs": {}}

    for name, cfg in CONFIGS.items():
        print(f"=== {name}: {cfg}")
        rng = np.random.default_rng(cfg["seed"])
        motifs = _make_motifs(rng)
        train_seq, train_labels = synth_genome(rng, 120_000, motifs)
        model = build_and_train(name, cfg, rng, motifs, train_seq,
                                train_labels)

        vecsize = cfg["vecsize"]
        # Records 1-2: window counts exact multiples of BATCH (bitwise
        # reference parity); record 3: partial final batch (corrected
        # offset — documents the deliberate fix).
        rec_specs = [
            ("rec1_exact", core_len_for_windows(vecsize, STEP, 2 * BATCH),
             25, 17, 0),
            ("rec2_exact", core_len_for_windows(vecsize, STEP, 3 * BATCH),
             0, 0, 80),
            ("rec3_partial", core_len_for_windows(vecsize, STEP, BATCH + 13),
             8, 0, 0),
        ]
        records = []
        for rec_name, core, lead, trail, internal in rec_specs:
            records.append((f"{name}_{rec_name}",
                            eval_record(rng, motifs, core, lead, trail,
                                        internal)))

        fa_path = os.path.join(_FIXDIR, f"{name}.fa")
        with open(fa_path, "w") as fh:
            fh.write(wrap_fasta(records))

        # Reference pipeline reads records the way the CLI does: per-line
        # upper-cased concatenation (__main__.py:20-43).
        bed_rows = []
        probs_snapshot = None
        for idx, (header, raw_seq) in enumerate(records):
            seq = raw_seq.upper()
            exact = "exact" in header
            rows_fixed, merged = ref_pipeline_bed(
                model, header, seq, vecsize, STEP, BATCH, N_CLASSES,
                MIN_MSS_LEN, XDROP_LEN, fixed_offset=True)
            if exact:
                # Exact-multiple records: the reference's own (buggy)
                # offset arithmetic must agree bitwise.
                rows_buggy, merged_buggy = ref_pipeline_bed(
                    model, header, seq, vecsize, STEP, BATCH, N_CLASSES,
                    MIN_MSS_LEN, XDROP_LEN, fixed_offset=False)
                assert rows_fixed == rows_buggy, header
                assert np.array_equal(merged, merged_buggy), header
            bed_rows.extend(rows_fixed)
            if idx == 0:
                _, onehot = ref_one_hot(seq)
                wins = np.stack(ref_windows(onehot, vecsize,
                                            STEP)[:N_PROB_WINDOWS])
                probs_snapshot = np.asarray(
                    model.predict_on_batch(wins), dtype=np.float32)
            n_segments = sum(1 for r in rows_fixed)
            # Decisiveness diagnostics: near-tie positions are where float32
            # drift between frameworks could flip the argmax.
            srt = np.sort(merged, axis=1)
            gap = srt[:, -1] - srt[:, -2]
            print(f"  {header}: {n_segments} BED rows, "
                  f"near-ties(<1e-3): {(gap < 1e-3).sum()}, "
                  f"median top-2 gap: {np.median(gap):.4f}")

        with open(os.path.join(_FIXDIR, f"{name}.bed"), "w") as fh:
            fh.write("\n".join(bed_rows) + "\n")
        np.save(os.path.join(_FIXDIR, f"{name}_probs.npy"), probs_snapshot)

        h5_path = os.path.join(_FIXDIR, f"{name}.h5")
        model.save(h5_path)  # whole-model HDF5, __main__.py:349-351
        manifest["configs"][name] = {
            **{k: v for k, v in cfg.items() if k != "seed"},
            "n_bed_rows": len(bed_rows),
        }
        print(f"  saved {h5_path} + expected BED ({len(bed_rows)} rows)")

    with open(os.path.join(_FIXDIR, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    print("fixtures written to", _FIXDIR)


if __name__ == "__main__":
    main()
