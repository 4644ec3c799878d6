from workoutdetector_tpu.ops.preprocess import (normalize_clip, resize_center_crop,
                                                sparse_window_gather, preprocess_windows)
# NOTE: do not re-export the `temporal_shift` function here — it would
# shadow the `ops.temporal_shift` submodule attribute. Import shift ops
# from workoutdetector_tpu.ops.temporal_shift directly.

__all__ = [
    "normalize_clip", "resize_center_crop", "sparse_window_gather",
    "preprocess_windows"
]
