"""Host and device operator library.

Host ops (C++ via ctypes with numpy fallbacks): DNA one-hot encoding,
Ruzzo–Tompa MSS labeling, strided overlap-max.  Device ops (pure
JAX/XLA/Pallas): window gathering, shifted overlap-max merge, score
transforms.
"""

from deepgrp_tpu.ops.encoding import one_hot_encode_dna_sequence
from deepgrp_tpu.ops.mss import find_mss_labels, mss_find_all
from deepgrp_tpu.ops.mss_device import (find_mss_labels_device,
                                        mss_classes_device,
                                        mss_classes_from_scored,
                                        mss_find_all_device)
from deepgrp_tpu.ops.overlap_max import get_max, overlap_max_merge
from deepgrp_tpu.ops.segments import (filter_segments, get_segments,
                                      segments_from_classes, yield_segments)

__all__ = [
    "one_hot_encode_dna_sequence",
    "find_mss_labels",
    "mss_find_all",
    "find_mss_labels_device",
    "mss_classes_device",
    "mss_classes_from_scored",
    "mss_find_all_device",
    "get_max",
    "overlap_max_merge",
    "filter_segments",
    "get_segments",
    "segments_from_classes",
    "yield_segments",
]
