"""Shape/semantic tests for the RepCount dataset classes over synthetic
rawframes (reference tests/test_repcount_dataset.py:88-99 +
tests/test_dataset.py:11-36 analogs)."""

import os.path as osp

import numpy as np
import pandas as pd
import pytest

from workoutdetector_tpu.data.datasets import FrameDataset, TDNDataset
from workoutdetector_tpu.data.loader import DataLoader
from workoutdetector_tpu.data.repcount import RepcountHelper
from workoutdetector_tpu.data.repcount_datasets import (RepcountImageDataset,
                                                        RepcountRecognitionDataset,
                                                        RepcountVideoDataset,
                                                        get_video_list)
from workoutdetector_tpu.data.transforms import TestTransform


@pytest.fixture(scope="module")
def repcount_root(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("RepCount")
    rows = []
    for split in ("train", "val"):
        for vi in range(2):
            name = f"{split}{vi}.mp4"
            frames_dir = root / "rawframes" / split / f"{split}{vi}"
            frames_dir.mkdir(parents=True)
            total = 40
            for i in range(1, total + 1):
                cv2.imwrite(str(frames_dir / f"img_{i:05}.jpg"),
                            np.full((48, 64, 3), (i * 6) % 255, np.uint8))
            rows.append({
                "name": name, "class_": "squat", "split": split, "count": 2,
                "reps": "0 16 16 32", "vid": "x", "start": 0, "end": total,
            })
    pd.DataFrame(rows).to_csv(root / "annotation.csv")
    return str(root)


def test_get_video_list(repcount_root):
    helper = RepcountHelper(repcount_root, osp.join(repcount_root, "annotation.csv"))
    videos = get_video_list(helper, "train", "squat")
    assert len(videos) == 2 * 2 * 2  # 2 videos × 2 reps × 2 halves
    for v in videos:
        assert v["label"] in (0, 1)
        assert v["length"] > 0
        assert v["end"] >= v["start"]


def test_get_video_list_action_none_is_split_only(tmp_path):
    """action=None must filter by split ONLY (reference
    repcount_dataset.py:333-385): a NaN class_ cell must not crash, and
    classes named 'all' or with uppercase letters pass through verbatim
    instead of expanding/vanishing in get_rep_data's action filter."""
    rows = [
        {"name": "a.mp4", "class_": "squat", "split": "train", "count": 1,
         "reps": "0 10", "vid": "v1", "start": 0, "end": 20},
        {"name": "b.mp4", "class_": float("nan"), "split": "train",
         "count": 1, "reps": "0 10", "vid": "v2", "start": 0, "end": 20},
        {"name": "c.mp4", "class_": "all", "split": "train", "count": 1,
         "reps": "0 10", "vid": "v3", "start": 0, "end": 20},
        {"name": "d.mp4", "class_": "BenchPress", "split": "train",
         "count": 1, "reps": "0 10", "vid": "v4", "start": 0, "end": 20},
        {"name": "e.mp4", "class_": "squat", "split": "val", "count": 1,
         "reps": "0 10", "vid": "v5", "start": 0, "end": 20},
    ]
    pd.DataFrame(rows).to_csv(tmp_path / "annotation.csv")
    helper = RepcountHelper(str(tmp_path), str(tmp_path / "annotation.csv"))
    videos = get_video_list(helper, "train", action=None)
    assert len(videos) == 4 * 2  # 4 train rows × (start→mid, mid→end)


def test_repcount_video_dataset(repcount_root):
    ds = RepcountVideoDataset(repcount_root, "squat", num_segments=8,
                              split="train", transform=TestTransform(size=32))
    assert len(ds) == 8
    clip, label = ds.__getitem__(0, np.random.default_rng(0))
    assert clip.shape == (8, 32, 32, 3)
    assert label in (0, 1)


def test_repcount_image_dataset(repcount_root):
    ds = RepcountImageDataset(repcount_root, "squat", split="val")
    assert len(ds) == 2 * 2 * 2  # 2 videos × 2 reps × (start, mid)
    img, label = ds[0]
    assert img.shape == (1, 48, 64, 3)
    assert ds.labels[:2] == [0, 1]


def test_repcount_recognition_dataset(repcount_root):
    ds = RepcountRecognitionDataset(repcount_root, "train",
                                    num_segments=8,
                                    transform=TestTransform(size=32))
    clip, label = ds.__getitem__(0, np.random.default_rng(0))
    # (T, H, W, C) NHWC — the reference returns (C, T, H, W) torch layout
    assert clip.shape == (8, 32, 32, 3)
    assert label == ds.action_map["squat"]


def test_frame_and_tdn_dataset_shapes(repcount_root, tmp_path):
    # 4-col rawframe list over the synthetic frames
    anno = tmp_path / "list.txt"
    with open(anno, "w") as f:
        f.write("train0 1 40 0\ntrain1 5 30 1\n")
    prefix = osp.join("rawframes", "train")
    fd = FrameDataset(repcount_root, str(anno), data_prefix=prefix,
                      num_segments=8, transform=TestTransform(size=32))
    clip, label = fd.__getitem__(0, np.random.default_rng(0))
    assert clip.shape == (8, 32, 32, 3)

    td = TDNDataset(repcount_root, str(anno), data_prefix=prefix,
                    num_segments=4, num_frames=5,
                    transform=TestTransform(size=32))
    burst, label = td.__getitem__(1, np.random.default_rng(0))
    assert burst.shape == (4 * 5, 32, 32, 3)  # reference: (T*5, C, H, W)

    loader = DataLoader(fd, batch_size=2, shuffle=True, num_workers=2, seed=0)
    x, y = next(iter(loader))
    assert x.shape == (2, 8, 32, 32, 3)
    assert y.shape == (2,)


def test_loader_propagates_worker_errors(tmp_path):
    """A decode failure must raise in the consumer, not hang the loader
    (regression: producer died silently and the consumer blocked forever)."""
    from workoutdetector_tpu.data.loader import DataLoader

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, idx, rng=None):
            raise FileNotFoundError(f"missing_{idx}.jpg")

    loader = DataLoader(Broken(), batch_size=4, num_workers=2)
    with pytest.raises(FileNotFoundError):
        next(iter(loader))
