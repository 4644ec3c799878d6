from workoutdetector_tpu.data.sampling import sample_frames, tdn_sample_indices, sparse_window_indices
from workoutdetector_tpu.data.repcount import (RepcountHelper, RepcountItem,
                                               RepcountItemWithPred, build_label_list)
from workoutdetector_tpu.data.datasets import (FrameDataset, ImageDataset, TDNDataset,
                                               DebugDataset, SuperImageDataset,
                                               build_dataset)

__all__ = [
    "sample_frames", "tdn_sample_indices", "sparse_window_indices", "RepcountHelper",
    "RepcountItem", "RepcountItemWithPred", "build_label_list", "FrameDataset",
    "ImageDataset", "TDNDataset", "DebugDataset", "SuperImageDataset",
    "build_dataset"
]
