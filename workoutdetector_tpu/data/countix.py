"""Countix annotation layer.

Capability match of reference workoutdetector/utils/common.py:154-250
(class Countix): annotation CSV loading for the workouts subset, video
path resolution, rep counts by YouTube id, and (when present) the
extracted-pose pickle dictionaries.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, Optional

import numpy as np
import pandas as pd

from workoutdetector_tpu.settings import DATA_ROOT, PROJ_ROOT


class Countix:
    """Countix workouts-subset annotations.

    CSV schema (datasets/Countix/workouts_{split}.csv):
        video_id, class, kinetics_start, kinetics_end,
        repetition_start, repetition_end, count
    """

    def __init__(self,
                 anno_root: Optional[str] = None,
                 data_root: Optional[str] = None,
                 load_pose: bool = False):
        self.anno_root = anno_root or osp.join(PROJ_ROOT, "datasets", "Countix")
        self.data_root = data_root or osp.join(DATA_ROOT, "Countix")
        frames = []
        for split in ("train", "val"):
            sp = self.get_anno(split)
            sp["split"] = split
            frames.append(sp)
        self.anno_all = pd.concat(frames, ignore_index=True)
        self.pose_data: Dict[str, Any] = self.load_pose() if load_pose else {}

    def get_anno(self, split: str = "train") -> pd.DataFrame:
        split = split.lower()
        if split not in ("train", "val"):
            raise ValueError(f"Invalid split: {split}. Must be train or val")
        path = osp.join(self.anno_root, f"workouts_{split}.csv")
        return pd.read_csv(path)

    def get_count(self, video_id: str) -> int:
        rows = self.anno_all[self.anno_all["video_id"] == video_id]
        if len(rows) == 0:
            raise ValueError(f"Video {video_id} not found in annotation")
        return int(rows["count"].values[0])

    def get_video(self, video_id: str) -> str:
        rows = self.anno_all[self.anno_all["video_id"] == video_id]
        if len(rows) == 0:
            raise ValueError(f"Video {video_id} not found in annotation")
        split = rows["split"].values[0]
        return osp.join(self.data_root, "videos", split, f"{video_id}.mp4")

    def load_pose(self) -> Dict[str, Any]:
        """Pose pickles {video_id: pose dict} when extracted
        (reference common.py:183-197)."""
        d: Dict[str, Any] = {}
        for split in ("train", "val"):
            path = osp.join(self.data_root, "pose", f"countix_{split}.pkl")
            if not osp.exists(path):
                continue
            poses = np.load(path, allow_pickle=True)
            for pose in poses:
                name = pose["frame_dir"]
                try:
                    pose["count"] = self.get_count(name)
                except ValueError:
                    pass
                d[name] = pose
        return d

    def get_pose(self, video_id: str) -> Dict[str, Any]:
        if video_id not in self.pose_data:
            raise ValueError(f"Video {video_id} not found in pose data")
        return self.pose_data[video_id]

    def __repr__(self) -> str:
        return (f"Countix(anno_root={self.anno_root}, "
                f"len_anno_all={len(self.anno_all)})")
