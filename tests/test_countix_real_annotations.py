"""Countix loader against the REAL annotation packs the reference ships.

Reads `datasets/Countix/workouts_{train,val}.csv` (the 10-action
workouts subset the reference's Countix class consumes,
reference utils/common.py:154-250) in place from the read-only mount;
nothing is copied. Skipped when the mount is absent.
"""

import os

import pytest

from workoutdetector_tpu.data.countix import Countix

REF_ROOT = "/root/reference/datasets/Countix"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF_ROOT, "workouts_train.csv")),
    reason="reference Countix pack not mounted")


@pytest.fixture(scope="module")
def cx(tmp_path_factory):
    data_root = str(tmp_path_factory.mktemp("countix_videos"))
    return Countix(anno_root=REF_ROOT, data_root=data_root)


def test_pack_sizes_and_schema(cx):
    train, val = cx.get_anno("train"), cx.get_anno("val")
    assert len(train) == 1092 and len(val) == 369  # shipped pack rows
    for df in (train, val):
        for col in ("video_id", "class", "kinetics_start", "kinetics_end",
                    "repetition_start", "repetition_end", "count"):
            assert col in df.columns
        assert (df["count"] >= 1).all()
        assert (df["kinetics_end"] > df["kinetics_start"]).all()
    # the subset really is the 10 workout actions of classes.txt
    with open(os.path.join(REF_ROOT, "classes.txt")) as f:
        classes = {ln.strip() for ln in f if ln.strip()}
    assert set(train["class"].unique()) <= classes
    assert set(val["class"].unique()) <= classes


def test_count_and_video_path_for_real_ids(cx):
    train = cx.get_anno("train")
    row = train.iloc[0]
    assert cx.get_count(row["video_id"]) == int(row["count"])
    path = cx.get_video(row["video_id"])
    assert path.endswith(f"{row['video_id']}.mp4")
    assert os.sep + "train" + os.sep in path
    with pytest.raises(ValueError):
        cx.get_count("definitely_not_a_video_id")


def test_invalid_split_rejected(cx):
    with pytest.raises(ValueError):
        cx.get_anno("test")  # the pack (and reference) has train/val only
