"""Pose pipeline: keypoint-pickle IO + visualization glue.

The reference extracts (P, T, 17, 3) keypoints with mmdet+mmpose HRNet
(workoutdetector/scripts/pose.py:35-162) — neither is in this image, so
extraction is gated with a clear error; the downstream consumers (pickle
load, per-video pose dicts, 2D rendering via utils.visualize.vis_2d_pose,
pose self-similarity via utils.similarity) are fully supported.
"""

from __future__ import annotations

import os.path as osp
import pickle
from typing import Any, Dict, List, Optional

import numpy as np


def inference_one_video(video_path: str, **kwargs) -> Dict[str, Any]:
    """Pose extraction requires a pose model, unavailable in this image."""
    raise RuntimeError(
        "Pose extraction needs a person detector + top-down pose model "
        "(mmdet/mmpose in the reference), which are not installed in this "
        "image. Provide pose pickles out-of-band; everything downstream "
        "(load_pose_pickle, render_pose_video, utils.similarity."
        "pose_self_similarity) works on them.")


def load_pose_pickle(path: str) -> List[Dict[str, Any]]:
    """Load a pose pickle: list of dicts with keys frame_dir, keypoint
    (P, T, 17, 2), keypoint_score (P, T, 17), img_shape, total_frames."""
    with open(path, "rb") as f:
        return pickle.load(f)


def render_pose_video(item: Dict[str, Any],
                      out_path: str,
                      video_path: Optional[str] = None,
                      thre: float = 0.5,
                      fps: float = 20.0) -> None:
    """Render one pose item to a skeleton video (reference gen_gif,
    utils/common.py:31-43)."""
    from workoutdetector_tpu.utils.visualize import vis_2d_pose

    frames = None
    if video_path and osp.exists(video_path):
        from workoutdetector_tpu.data.video import VideoReader
        with VideoReader(video_path) as r:
            frames = r.read_raw()
    kp = np.asarray(item["keypoint"])
    scores = np.asarray(item.get("keypoint_score")) if "keypoint_score" in item \
        else None
    vis_2d_pose(kp, scores, frames=frames,
                img_shape=tuple(item.get("img_shape", (480, 640))),
                thre=thre, out_path=out_path, fps=fps)
