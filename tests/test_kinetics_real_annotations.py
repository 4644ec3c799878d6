"""Kinetics-400 layer against the REAL CSV packs the reference ships
(datasets/kinetics400/: 400-label map + test/validate splits). Read in
place from the read-only mount; skipped when absent."""

import os

import pytest

from workoutdetector_tpu.data.kinetics import load_labels, split_to_rawframe_list

REF_ROOT = "/root/reference/datasets/kinetics400"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF_ROOT, "kinetics_400_labels.csv")),
    reason="reference kinetics pack not mounted")


def test_label_map_is_the_full_400(tmp_path):
    labels = load_labels(os.path.join(REF_ROOT, "kinetics_400_labels.csv"))
    assert len(labels) == 400
    assert sorted(labels.values()) == list(range(400))
    assert labels["abseiling"] == 0
    assert "squat" in labels  # the workout-adjacent classes exist
    assert "bench pressing" in labels


def test_split_csv_converts_against_real_rows(tmp_path):
    """Build rawframe dirs for the first rows of the real validate.csv in
    both supported layouts and convert; rows without local frames are
    skipped (partial-k400 is the norm)."""
    import pandas as pd
    split_csv = os.path.join(REF_ROOT, "validate.csv")
    df = pd.read_csv(split_csv)
    assert set(["label", "youtube_id", "time_start", "time_end",
                "split"]) <= set(df.columns)
    assert len(df) > 17000

    root = tmp_path / "rawframes"
    root.mkdir()
    # row 0: mmaction-style dir; row 1: plain-id dir; row 2: no frames
    r0, r1 = df.iloc[0], df.iloc[1]
    d0 = root / f"{r0['youtube_id']}_{int(r0['time_start']):06}_{int(r0['time_end']):06}"
    d0.mkdir()
    for i in range(3):
        (d0 / f"img_{i:05}.jpg").write_bytes(b"x")
    d1 = root / str(r1["youtube_id"])
    d1.mkdir()
    (d1 / "img_00000.jpg").write_bytes(b"x")

    out = tmp_path / "val.txt"
    n = split_to_rawframe_list(split_csv, str(root), str(out),
                               labels_csv=os.path.join(
                                   REF_ROOT, "kinetics_400_labels.csv"))
    assert n == 2
    labels = load_labels(os.path.join(REF_ROOT, "kinetics_400_labels.csv"))
    lines = out.read_text().strip().splitlines()
    assert lines[0].split() == [d0.name, "3", str(labels[str(r0["label"])])]
    assert lines[1].split() == [d1.name, "1", str(labels[str(r1["label"])])]
