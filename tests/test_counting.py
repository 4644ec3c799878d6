"""Golden tests for the rep-counting state machine and count metrics.

Golden input/output tables carried over from the reference suite
(tests/test_inference_count.py:8-48) — the primary parity oracle.
"""

import numpy as np
import pytest

from workoutdetector_tpu.counting import (analyze_count, eval_score_dir,
                                          majority_vote_states, obo_mae,
                                          pred_to_count, scores_to_preds, to_softmax)


def test_pred_to_count_golden():
    step = 8
    x1 = [0] * 10 + [1, 1, 0, 0, 0, 0]
    assert pred_to_count(x1, step=step) == (1, [0, 10 * step])

    x2 = [0, 0, 2, 2, 2, 5, 5, 5, 5, 6, 6, 9, 9, 9]
    assert pred_to_count(x2, step=step) == (0, [])

    x3 = [-1, -1, -1, 1, 1, 2, 3, 2, 3, 2, 3, 3, 3, 0, -1, -1]
    assert pred_to_count(x3, step=step) == (3, [x * step for x in [5, 6, 7, 8, 9, 10]])

    x4 = [6, 6, 6, 7, 7, 8, 7, 6, 6, 7]
    assert pred_to_count(x4, step=step) == (2, [x * step for x in [0, 3, 7, 9]])

    x5 = [
        -1, -1, 9, 9, 8, -1, -1, -1, -1, -1, -1, 6, 6, 7, 6, 6, 7, 6, 6, 7, -1, -1, -1,
        -1, -1, -1, -1
    ]
    count, _ = pred_to_count(x5, step=8)
    assert count == 3

    x6 = [
        2, 3, 3, 2, 3, 3, 3, 2, 3, 3, 2, 2, 3, 3, 2, 2, 3, 3, 2, 2, 3, 3, 2, 3, 3, 2, 2,
        3, 3, 2, 2, 3, 3, 2, 2, 3, 3, -1
    ]
    y6_reps = [
        0, 8, 24, 32, 56, 64, 80, 96, 112, 128, 144, 160, 176, 184, 200, 216, 232, 248,
        264, 280
    ]
    assert pred_to_count(x6, step=8) == (10, y6_reps)


def test_pred_to_count_docstring_example():
    # reference utils/inference_count.py:141-143
    preds = [-1, -1, 6, 6, 6, 7, 6, 6, 6, 7, 6, 6, 7, 7, 6, 6, 7, 7, 6, 6, 7, 7, 6, 6, 7,
             7, -1]
    assert pred_to_count(preds, step=8) == \
        (6, [16, 40, 48, 72, 80, 96, 112, 128, 144, 160, 176, 192])


def test_pred_to_count_empty_and_background_only():
    assert pred_to_count([], step=8) == (0, [])
    assert pred_to_count([-1] * 5, step=8) == (0, [])


def test_obo_mae():
    # exact off-by-one definition (reference utils/eval.py:20)
    mae, obo = obo_mae([3, 5, 7], [3, 4, 9])
    assert mae == pytest.approx((0 + 1 + 2) / 3)
    assert obo == pytest.approx(1 / 3)
    mae, obo = obo_mae([2, 2], [2, 3], ratio=False)
    assert mae == pytest.approx(0.5)
    assert obo == 1  # raw count, not ratio


def test_to_softmax_and_threshold():
    scores = {"0": 1.0, "1": 3.0}
    sm = to_softmax(scores)
    assert sm["1"] > sm["0"]
    assert sum(sm.values()) == pytest.approx(1.0)

    raw = {"a": {"0": 0.9, "1": 0.05}, "b": {"0": 0.3, "1": 0.4}}
    assert scores_to_preds(raw, threshold=0.5) == [0, -1]
    assert scores_to_preds(raw, threshold=0.2) == [0, 1]


def test_majority_vote_states():
    seq = [1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    states = majority_vote_states(seq, window=7)
    # needs >=4 ones in window of last 7
    assert states[3] == 1  # [1,1,1,1] → sum 4 >= 4
    assert states[0] == 0  # only one 1 seen
    assert states[-1] == 0


def test_eval_score_dir_and_analyze(tmp_path):
    import json
    import pandas as pd
    # synthetic annotation
    anno = pd.DataFrame({
        "name": ["v1.mp4", "v2.mp4"],
        "class_": ["squat", "push_up"],
        "split": ["val", "val"],
        "count": [2, 1],
        "reps": ["0 10 10 20", "0 30"],
        "vid": ["x", "y"],
        "start": [0, 0],
        "end": [100, 100],
    })
    anno_path = tmp_path / "annotation.csv"
    anno.to_csv(anno_path)

    # v1: predicted 2 reps (exact), v2: predicted 2 (off by one)
    out = tmp_path / "scores"
    out.mkdir()
    v1_scores = {str(i): {"0": s0, "1": s1}
                 for i, (s0, s1) in enumerate([(0.9, 0.1), (0.1, 0.9), (0.9, 0.1),
                                               (0.1, 0.9)])}
    v2_scores = {str(i): {"0": s0, "1": s1}
                 for i, (s0, s1) in enumerate([(0.9, 0.1), (0.1, 0.9), (0.9, 0.1),
                                               (0.1, 0.9)])}
    json.dump({"scores": v1_scores, "action": "squat"}, open(out / "v1.score.json", "w"))
    json.dump({"scores": v2_scores, "action": "push_up"}, open(out / "v2.score.json", "w"))

    mae, obo, rows = eval_score_dir(str(out), str(anno_path), str(tmp_path / "eval.csv"))
    # v1: pred 2 gt 2 → diff 0; v2: pred 2 gt 1 → diff 1
    assert mae == pytest.approx(0.5)
    assert obo == pytest.approx(0.5)

    meta = analyze_count(str(tmp_path / "eval.csv"), str(tmp_path / "meta.csv"))
    assert set(meta.action) == {"squat", "push_up", "all"}
    all_row = meta[meta.action == "all"].iloc[0]
    assert all_row.total == 2
