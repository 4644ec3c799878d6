from workoutdetector_tpu.data.sampling import sample_frames, tdn_sample_indices, sparse_window_indices
from workoutdetector_tpu.data.repcount import (RepcountHelper, RepcountItem,
                                               RepcountItemWithPred, build_label_list)
from workoutdetector_tpu.data.datasets import (FrameDataset, ImageDataset, TDNDataset,
                                               DebugDataset, SuperImageDataset,
                                               build_dataset)
from workoutdetector_tpu.data.image_folder import ImageFolderDataset
from workoutdetector_tpu.data.repcount_datasets import (RepcountImageDataset,
                                                        RepcountRecognitionDataset,
                                                        RepcountVideoDataset)
from workoutdetector_tpu.data.countix import Countix

__all__ = [
    "sample_frames", "tdn_sample_indices", "sparse_window_indices", "RepcountHelper",
    "RepcountItem", "RepcountItemWithPred", "build_label_list", "FrameDataset",
    "ImageDataset", "TDNDataset", "DebugDataset", "SuperImageDataset",
    "ImageFolderDataset", "RepcountImageDataset", "RepcountVideoDataset",
    "RepcountRecognitionDataset", "Countix", "build_dataset"
]
