"""RepCount dataset classes over rawframes.

Capability match of reference workoutdetector/datasets/repcount_dataset.py
:254-572 (RepcountDataset.get_video_list, RepcountImageDataset,
RepcountVideoDataset, RepcountRecognitionDataset) — numpy/uint8 items for
the device feed, seeded sampling.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from workoutdetector_tpu.data.datasets import read_image
from workoutdetector_tpu.data.repcount import ACTIONS, RepcountHelper
from workoutdetector_tpu.data.sampling import sample_frames


def get_video_list(helper: RepcountHelper,
                   split: str,
                   action: Optional[str] = None,
                   max_reps: int = 2) -> List[dict]:
    """Per-rep half-segments as binary-labeled spans (reference
    repcount_dataset.py:333-385): start→mid = label 0, mid→end = label 1;
    1-based frame indices; at most ``max_reps`` reps per video.

    action=None means every class present in the annotation csv (the
    reference's get_video_list filters by split only — including classes
    its own RepcountHelper excludes, e.g. bench_pressing), NOT the
    helper's cleaned 6-action list. max_reps < 1 follows the reference's
    DOCSTRING (all reps); its code does ``reps[:max_reps * 2]``
    unconditionally, so the reference returns [] for 0 and silently drops
    the last rep for -1 — a latent reference bug, documented by
    tests/test_reference_exec_parity.py."""
    # action=None → split-only filter inside get_rep_data: robust to NaN
    # class_ cells, uppercase classes, or a class literally named 'all'
    # (deriving a list from the raw csv here would crash or mis-expand)
    data = helper.get_rep_data(split=[split],
                               action=[action] if action else None)
    videos: List[dict] = []
    for item in data.values():
        if item.count <= 0:
            continue
        reps = item.reps[:max_reps * 2] if max_reps > 0 else item.reps
        for start, end in zip(reps[0::2], reps[1::2]):
            start, end = start + 1, end + 1  # frames are 1-indexed on disk
            mid = (start + end) // 2
            videos.append(dict(video_path=item.frames_path, start=start, end=mid,
                               length=mid - start + 1, class_=item.class_, label=0))
            videos.append(dict(video_path=item.frames_path, start=mid + 1, end=end,
                               length=end - mid, class_=item.class_, label=1))
    return videos


class RepcountImageDataset:
    """Binary image dataset: first-frame (0) vs mid-frame (1) of each rep
    for one action (reference repcount_dataset.py:409-454)."""

    def __init__(self,
                 root: str,
                 action: str,
                 split: str = "train",
                 transform: Optional[Callable] = None,
                 anno_file: Optional[str] = None) -> None:
        assert action in ACTIONS, f"{action} not in {ACTIONS}"
        helper = RepcountHelper(root, anno_file or osp.join(root, "annotation.csv"))
        data = helper.get_rep_data(split=[split], action=[action])
        self.images: List[str] = []
        self.labels: List[int] = []
        for item in data.values():
            if item.count <= 0:
                continue
            for start, end in zip(item.reps[0::2], item.reps[1::2]):
                start, end = start + 1, end + 1
                mid = (start + end) // 2
                self.images.append(osp.join(item.frames_path, f"img_{start:05}.jpg"))
                self.images.append(osp.join(item.frames_path, f"img_{mid:05}.jpg"))
                self.labels.extend([0, 1])
        self.transform = transform
        self.action = action

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None
                   ) -> Tuple[np.ndarray, int]:
        if rng is None:
            rng = np.random.default_rng()
        img = read_image(self.images[idx])[None]
        if self.transform is not None:
            img = self.transform(img, rng)
        return img, self.labels[idx]

    def __len__(self) -> int:
        return len(self.images)


class RepcountVideoDataset:
    """Binary video dataset over rep half-segments, 8-segment sampled
    (reference repcount_dataset.py:457-515)."""

    def __init__(self,
                 root: str,
                 action: str,
                 num_segments: int = 8,
                 split: str = "train",
                 transform: Optional[Callable] = None,
                 filename_tmpl: str = "img_{:05}.jpg",
                 anno_file: Optional[str] = None,
                 is_test: bool = False) -> None:
        assert action in ACTIONS, f"{action} not in {ACTIONS}"
        helper = RepcountHelper(root, anno_file or osp.join(root, "annotation.csv"))
        self.video_list = get_video_list(helper, split, action)
        self.num_segments = num_segments
        self.transform = transform
        self.tmpl = filename_tmpl
        self.random = not is_test

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None
                   ) -> Tuple[np.ndarray, int]:
        if rng is None:
            rng = np.random.default_rng()
        info = self.video_list[idx]
        samples = sample_frames(info["length"], self.num_segments, info["start"],
                                self.random, rng)
        clip = np.stack([
            read_image(osp.join(info["video_path"], self.tmpl.format(i)))
            for i in samples
        ])
        if self.transform is not None:
            clip = self.transform(clip, rng)
        assert clip.shape[0] == self.num_segments
        return clip, info["label"]

    def __len__(self) -> int:
        return len(self.video_list)


class RepcountRecognitionDataset:
    """Action classification over the full rep span reps[0]..reps[-1]
    (reference repcount_dataset.py:518-572)."""

    def __init__(self,
                 root: str,
                 split: str,
                 actions: Optional[List[str]] = None,
                 num_segments: int = 8,
                 transform: Optional[Callable] = None,
                 filename_tmpl: str = "img_{:05}.jpg",
                 anno_file: Optional[str] = None,
                 is_test: bool = False) -> None:
        helper = RepcountHelper(root, anno_file or osp.join(root, "annotation.csv"))
        if actions is None:
            actions = helper.classes
        self.video_list = list(
            helper.get_rep_data(split=[split], action=actions).values())
        self.num_segments = num_segments
        self.transform = transform
        self.tmpl = filename_tmpl
        self.action_map: Dict[str, int] = {a: i for i, a in enumerate(actions)}
        self.random = not is_test

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None
                   ) -> Tuple[np.ndarray, int]:
        if rng is None:
            rng = np.random.default_rng()
        item = self.video_list[idx]
        if item.reps:
            rep_start, rep_end = item.reps[0], item.reps[-1]
        else:
            rep_start, rep_end = 0, max(item.total_frames - 1, 1)
        idx_list = sample_frames(max(rep_end - rep_start, 1), self.num_segments,
                                 offset=rep_start, random=self.random, rng=rng)
        clip = np.stack([
            read_image(osp.join(item.frames_path, self.tmpl.format(i + 1)))
            for i in idx_list
        ])
        if self.transform is not None:
            clip = self.transform(clip, rng)
        return clip, self.action_map[item.class_]

    def __len__(self) -> int:
        return len(self.video_list)
