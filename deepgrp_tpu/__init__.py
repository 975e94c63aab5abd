"""deepgrp_tpu — a TPU-native framework for genomic repeat annotation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
fhausmann/deepgrp (reference surveyed in /root/repo/SURVEY.md): prediction of
genomic repetitive elements (HSAT2,3 / alphoid / Alu / LINE-1) in DNA
sequences with a weight-shared forward/reverse-complement GRU (or LSTM) with
optional additive attention over fixed-size sliding windows, followed by a
maximum-scoring-segment dynamic program that cleans window-level
probabilities into contiguous BED-like segments.

Architecture (TPU-first, not a port):
  * one-hot chromosomes are HBM-resident; window cutting, the RNN scan, the
    overlap-max merge and scoring all run on device under a single ``jit``
    (reference: python generator + per-batch callbacks,
    ``prediction.py:89-111``),
  * the RNN recurrence is a single ``lax.scan`` whose XLA schedule was
    measured fastest at the flagship dims, with a fused Pallas kernel
    available as an override for larger recurrent widths,
  * multi-chip scaling is a ``jax.sharding.Mesh`` + ``shard_map`` data-parallel
    window stream with boundary-overlap exchange via collectives (the
    reference is single-process, single-device),
  * the host-side hot loops (FASTA one-hot encoding, Ruzzo–Tompa MSS,
    overlap-max fallback) are a C++ library loaded through ctypes with pure
    numpy fallbacks (reference: Cython + C, ``deepgrp/_mss/mss.c``,
    ``deepgrp/maxcalc.c``, ``deepgrp/sequence.pyx``).
"""

from deepgrp_tpu.config import Options, create_logdir

__version__ = "0.1.0"

__all__ = ["Options", "create_logdir", "__version__"]
