"""RepcountHelper tests with a synthetic annotation.csv and the analytic
metric oracle from the reference suite (tests/test_repcount_dataset.py:66-85):
perturbing every gt count by ±1 must give exactly the analytic MAE and
OBO == 1.0."""

import numpy as np
import pandas as pd
import pytest

from workoutdetector_tpu.data.repcount import (RepcountHelper, RepcountItem,
                                               build_label_list,
                                               build_video_label_list)


@pytest.fixture()
def anno_csv(tmp_path):
    rows = []
    rng = np.random.default_rng(0)
    i = 0
    for split in ("train", "val", "test"):
        for action in ("squat", "push_up", "situp"):
            for k in range(3):
                count = int(rng.integers(1, 6))
                bounds = np.sort(rng.choice(np.arange(200), size=2 * count,
                                            replace=False))
                rows.append({
                    "name": f"vid{i}.mp4",
                    "class_": action,
                    "split": split,
                    "count": count,
                    "reps": " ".join(map(str, bounds)),
                    "vid": f"ytb{i}",
                    "start": 0,
                    "end": 300,
                })
                i += 1
    df = pd.DataFrame(rows)
    path = tmp_path / "annotation.csv"
    df.to_csv(path)
    return str(tmp_path), str(path)


def test_get_rep_data_filters(anno_csv):
    root, anno = anno_csv
    helper = RepcountHelper(root, anno)
    data = helper.get_rep_data(split=["train"], action=["squat"])
    assert len(data) == 3
    for item in data.values():
        assert item.split == "train"
        assert item.class_ == "squat"
        assert len(item.reps) == 2 * item.count
        # reps ordering invariant (reference test :57-64)
        assert all(b >= a for a, b in zip(item.reps, item.reps[1:]))

    all_data = helper.get_rep_data(split=["train", "val", "test"], action=["all"])
    assert len(all_data) == 27


def test_get_rep_data_nan_count_row(anno_csv, tmp_path):
    """A NaN count cell behaves like the reference's ``count > 0`` on NaN
    (False): the row loads with count 0 and no reps instead of raising."""
    root, anno = anno_csv
    df = pd.read_csv(anno, index_col=0)
    df.loc[len(df)] = {"name": "nan_count.mp4", "class_": "squat",
                       "split": "train", "count": np.nan, "reps": np.nan,
                       "vid": "ytbX", "start": 0, "end": 300}
    df.to_csv(anno)
    helper = RepcountHelper(root, anno)
    data = helper.get_rep_data(split=["train"], action=["squat"])
    assert data["nan_count.mp4"].count == 0
    assert data["nan_count.mp4"].reps == []


def test_eval_count_analytic_oracle(anno_csv):
    root, anno = anno_csv
    helper = RepcountHelper(root, anno)
    items = helper.get_rep_data(split=["val"], action=["all"])
    # perturb each count by ±1 → MAE = mean(1/gt), OBO = 1.0
    preds = {}
    expected_mae = 0.0
    for j, (name, item) in enumerate(items.items()):
        delta = 1 if j % 2 == 0 else -1
        preds[name] = item.count + delta
        expected_mae += 1.0 / item.count if item.count > 0 else 0.0
    expected_mae /= len(items)
    mae, obo, pred_items = helper.eval_count(preds, split=["val"], action=["all"])
    assert mae == pytest.approx(expected_mae)
    assert obo == pytest.approx(1.0)
    assert all(p.obo_acc for p in pred_items.values())


def test_eval_count_exact(anno_csv):
    root, anno = anno_csv
    helper = RepcountHelper(root, anno)
    items = helper.get_rep_data(split=["test"], action=["all"])
    preds = {name: item.count for name, item in items.items()}
    mae, obo, _ = helper.eval_count(preds, split=["test"], action=["all"])
    assert mae == 0.0
    assert obo == 1.0


def test_build_label_list(anno_csv, tmp_path):
    root, anno = anno_csv
    out = tmp_path / "RepImage"
    build_label_list(root, anno, ["squat", "push_up"], str(out), overwrite=True)
    lines = open(out / "train.txt").read().strip().splitlines()
    # 3 squat + 3 push_up train videos × 2 lines each
    assert len(lines) == 12
    for ln in lines:
        path, cls = ln.split()
        assert int(cls) in (0, 1, 2, 3)
        assert path.endswith(".jpg")


def test_build_video_label_list(anno_csv, tmp_path):
    root, anno = anno_csv
    out = tmp_path / "Binary"
    build_video_label_list(root, anno, ["squat", "push_up"], str(out), overwrite=True)
    all_train = open(out / "all-train.txt").read().strip().splitlines()
    assert len(all_train) > 0
    for ln in all_train:
        parts = ln.split()
        assert len(parts) == 4  # path start length label
        assert int(parts[2]) > 0
    assert (out / "squat" / "train.txt").exists()
