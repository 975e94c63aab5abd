"""Multi-chip scaling: mesh construction, sharded inference, DP training.

The reference is single-process single-device (SURVEY §2 "Parallelism
status"); this layer is new, built TPU-first: model weights are replicated,
the chromosome window stream AND the sequence itself are sharded
data-parallel over a 1-D ``jax.sharding.Mesh`` (each device holds only its
chunk range plus a halo), per-shard overlap-max merges are stitched at
shard boundaries from tiny spill/head arrays, and training runs as
data-parallel gradient ``psum`` inside ``shard_map``.
"""

from deepgrp_tpu.parallel.mesh import make_mesh
from deepgrp_tpu.parallel.predict import ShardedPredictionEngine
from deepgrp_tpu.parallel.train import make_dp_train_step

__all__ = ["make_mesh", "ShardedPredictionEngine", "make_dp_train_step"]
