from workoutdetector_tpu.infer.engine import InferenceEngine
from workoutdetector_tpu.infer.inference_count import (
    count_by_image_model, count_by_motion_periodicity, count_by_repnet,
    count_by_similarity, count_by_video_model, eval_count_shards,
    eval_dataset, inference_dataset)

__all__ = [
    "InferenceEngine", "count_by_image_model", "count_by_motion_periodicity",
    "count_by_repnet", "count_by_similarity", "count_by_video_model",
    "eval_count_shards", "eval_dataset", "inference_dataset"
]
