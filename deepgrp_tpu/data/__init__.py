"""Host data plane: FASTA IO, label preprocessing, RepeatMasker parsing."""

from deepgrp_tpu.data.preprocess import Data, drop_start_end_n, preprocess_y
from deepgrp_tpu.data.fasta import read_multi_fasta

__all__ = ["Data", "drop_start_end_n", "preprocess_y", "read_multi_fasta"]
