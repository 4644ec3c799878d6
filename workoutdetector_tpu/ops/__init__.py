from workoutdetector_tpu.ops.preprocess import (normalize_clip, resize_center_crop,
                                                sparse_window_gather, preprocess_windows)
from workoutdetector_tpu.ops.temporal_shift import temporal_shift

__all__ = [
    "normalize_clip", "resize_center_crop", "sparse_window_gather",
    "preprocess_windows", "temporal_shift"
]
