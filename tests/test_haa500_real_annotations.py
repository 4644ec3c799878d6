"""haa500 label packs (the reference's image-classification-baseline data,
reference image_classification.py:113-243 + datasets/haa500/) parsed by
our dataset layers, read in place from the read-only mount."""

import os

import pytest

from workoutdetector_tpu.data.datasets import ImageDataset

REF_ROOT = "/root/reference/datasets/haa500"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF_ROOT, "train-img.txt")),
    reason="reference haa500 pack not mounted")


def _classes():
    with open(os.path.join(REF_ROOT, "classes.txt")) as f:
        return [ln.strip() for ln in f if ln.strip()]


def test_image_lists_parse_with_16_workout_classes(tmp_path):
    classes = _classes()
    assert len(classes) == 16
    assert "pushup" in classes and "burpee" in classes
    ds = ImageDataset(str(tmp_path), anno_path=os.path.join(
        REF_ROOT, "train-img.txt"))
    val = ImageDataset(str(tmp_path), anno_path=os.path.join(
        REF_ROOT, "val-img.txt"))
    assert len(ds) == 1609 and len(val) == 522
    labels = {y for _, y in ds.anno}
    assert labels == set(range(16))  # every class represented in train
    # paths are relative 'train-img/<class>_<vid>_<frame>.png' rows whose
    # class prefix agrees with the label column
    for path, y in ds.anno[:50]:
        stem = os.path.basename(path)
        assert stem.startswith(classes[y]), (path, classes[y])


def test_video_lists_parse_as_3col_frame_annotations(tmp_path):
    # video lists are 2-col `path label` for decode-based datasets;
    # this test validates their schema + label agreement (it does NOT
    # exercise FrameDataset's parser on them)
    rows = []
    with open(os.path.join(REF_ROOT, "train.txt")) as f:
        for ln in f:
            if ln.strip():
                p, y = ln.split()
                rows.append((p, int(y)))
    assert len(rows) == 240
    classes = _classes()
    for p, y in rows:
        assert p.endswith(".mp4")
        assert os.path.basename(p).startswith(classes[y])
