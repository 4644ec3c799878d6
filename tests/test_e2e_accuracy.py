"""Full-loop accuracy gate: TRAIN a state classifier, score a synthetic
RepCount split with inference_dataset, evaluate MAE/OBO with
eval_score_dir — the reference's headline metric pipeline
(workoutdetector/utils/eval.py:117-180, published MAE 4.0141/OBO 0.2293)
run end-to-end in-framework. On separable synthetic data the trained
model must count exactly: MAE 0, OBO 1."""

import json
import os

import jax
import numpy as np
import pytest

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.counting import eval_score_dir
from workoutdetector_tpu.infer import InferenceEngine, inference_dataset
from workoutdetector_tpu.parallel.mesh import shard_batch
from workoutdetector_tpu.train.trainer import Trainer

SIZE = 32
DARK, BRIGHT = 35, 220


def _train_state_classifier():
    cfg = Config()
    cfg.model.model_type = "tsm"
    cfg.model.base_model = "resnet18"
    cfg.model.num_class = 2
    cfg.model.num_segments = 8
    cfg.model.dropout = 0.0
    cfg.model.dtype = "float32"
    cfg.data.image_size = SIZE
    cfg.data.num_segments = 8
    cfg.optimizer.lr = 0.05
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=12, image_size=SIZE)
    step = trainer.train_step_fn()
    rng = np.random.default_rng(0)
    for _ in range(12):
        y = rng.integers(0, 2, (8,)).astype(np.int32)
        vals = np.where(y == 0, DARK, BRIGHT).astype(np.uint8)
        x = np.broadcast_to(vals[:, None, None, None, None],
                            (8, 8, SIZE, SIZE, 3)).copy()
        x += rng.integers(0, 12, x.shape, dtype=np.uint8)
        bx, by = shard_batch((x, y), trainer.mesh)
        state, m = step(state, bx, by)
    # sanity on the helper, not the property under test: allow one
    # stray misclass so benign numeric drift (XLA bumps) cannot turn
    # a still-valid counting test into a setup failure
    assert float(m["acc"]) >= 0.875, float(m["acc"])
    return trainer, state


def test_trained_model_counts_repcount_split(tmp_path):
    import cv2
    import pandas as pd

    trainer, state = _train_state_classifier()
    engine = InferenceEngine(
        trainer.model,
        {"params": state.params, "batch_stats": state.batch_stats},
        num_segments=8, window_batch=8, image_size=SIZE)

    data_root = tmp_path / "RepCount"
    (data_root / "videos" / "test").mkdir(parents=True)
    rng = np.random.default_rng(3)
    rows = []
    for v, n_reps in enumerate((2, 3, 1)):
        name = f"t{v}.mp4"
        w = cv2.VideoWriter(str(data_root / "videos" / "test" / name),
                            cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 64))
        reps = []
        frame_idx = 0
        for r in range(n_reps):
            reps.append(frame_idx)
            for val in (DARK, BRIGHT):
                for _ in range(24):
                    f = np.full((64, 64, 3), val, np.uint8)
                    f += rng.integers(0, 10, f.shape, dtype=np.uint8)
                    w.write(f)
                    frame_idx += 1
            reps.append(frame_idx - 24)  # mid (state flip) marker
        w.release()
        rows.append(dict(name=name, class_=["squat", "push_up", "situp"][v],
                         split="test", count=n_reps,
                         reps=" ".join(map(str, reps)),
                         vid=name, start=0, end=frame_idx))
    pd.DataFrame(rows).to_csv(data_root / "annotation.csv")

    out_dir = tmp_path / "scores"
    inference_dataset(engine, ["test"], str(out_dir), checkpoint="trained",
                      data_root=str(data_root),
                      anno_path=str(data_root / "annotation.csv"))
    assert len(os.listdir(out_dir)) == 3

    mae, obo, per_video = eval_score_dir(
        str(out_dir), str(data_root / "annotation.csv"), softmax=True)
    counts = {r["name"]: r["pred_count"] for r in per_video}
    assert counts == {"t0.mp4": 2, "t1.mp4": 3, "t2.mp4": 1}, counts
    assert mae == pytest.approx(0.0)
    # obo_mae implements the reference's EXACT ==1 definition
    # (utils/eval.py:20, see BASELINE.md caveats): perfect counts ⇒ 0
    assert obo == pytest.approx(0.0)
