"""Tests for temporal pooling, SuperImageDataset, profiling hooks,
eval CLIs, dataset viewer fallback."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SMALL = 32


def test_tsm_temporal_pool_shapes():
    from workoutdetector_tpu.models import TSM

    model = TSM(num_class=4, num_segments=8, base_model="resnet18",
                temporal_pool=True, dropout=0.0)
    x = jnp.zeros((2, 8, SMALL, SMALL, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 4)


def test_temporal_pool_is_max_over_time():
    """Pool semantics: window 3, stride 2, pad 1 along T (reference
    TemporalPool, tsm.py:94-101)."""
    from workoutdetector_tpu.models.tsm import TSM

    m = TSM(num_class=2, num_segments=4, temporal_pool=True)
    # drive the hook directly: (B*T, H, W, C) with time-coded values
    x = jnp.arange(4, dtype=jnp.float32).reshape(4, 1, 1, 1) * jnp.ones((4, 2, 2, 3))
    pooled = m._stage_hook(x, stage_idx=1)
    assert pooled.shape == (2, 2, 2, 3)
    # windows at t=0: max(pad, x0, x1)=1 ; t=1: max(x1, x2, x3)=3
    np.testing.assert_allclose(np.asarray(pooled[0, 0, 0, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(pooled[1, 0, 0, 0]), 3.0)
    # identity at other stages
    assert m._stage_hook(x, stage_idx=0).shape == x.shape


def test_super_image_dataset(tmp_path):
    import cv2
    from workoutdetector_tpu.data.datasets import SuperImageDataset

    paths = []
    for i in range(9):
        p = str(tmp_path / f"f{i}.jpg")
        cv2.imwrite(p, np.full((40, 40, 3), i * 25, np.uint8))
        paths.append(p)
    ds = SuperImageDataset([paths], [3], num_image=9, image_size=60)
    img, label = ds[0]
    assert img.shape == (60, 60, 3)
    assert label == 3
    # grid ordering: top-left tile darker than bottom-right
    assert img[:20, :20].mean() < img[-20:, -20:].mean()
    with pytest.raises(ValueError):
        SuperImageDataset([paths], [0], num_image=5)


def test_step_timer():
    from workoutdetector_tpu.utils.profiling import StepTimer

    t = StepTimer()
    assert t.stats()["steps_per_sec"] == 0.0
    t.tick()
    t.tick()
    s = t.stats(batch_size=4)
    assert s["steps_per_sec"] > 0
    assert s["examples_per_sec"] == pytest.approx(4 * s["steps_per_sec"])


def test_profiler_trace(tmp_path):
    from workoutdetector_tpu.utils.profiling import annotate, trace

    with trace(str(tmp_path / "prof")):
        with annotate("matmul"):
            jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    # a plugins/profile dir with at least one capture should exist
    found = []
    for root, dirs, files in os.walk(tmp_path / "prof"):
        found.extend(files)
    assert found, "no trace files written"


def test_eval_count_cli(tmp_path, capsys):
    import pandas as pd
    from workoutdetector_tpu.scripts.eval_count import main

    anno = pd.DataFrame({
        "name": ["v1.mp4"], "class_": ["squat"], "split": ["val"],
        "count": [1], "reps": ["0 16"], "vid": ["x"], "start": [0], "end": [32],
    })
    anno_path = tmp_path / "annotation.csv"
    anno.to_csv(anno_path)
    jd = tmp_path / "scores"
    jd.mkdir()
    scores = {"0": {"0": 0.9, "1": 0.1}, "8": {"0": 0.1, "1": 0.9}}
    json.dump({"scores": scores, "action": "squat"},
              open(jd / "v1.score.json", "w"))
    out_csv = tmp_path / "eval.csv"
    main([str(jd), str(anno_path), "-o", str(out_csv)])
    out = capsys.readouterr().out
    assert "Mean absolute error: 0.0000" in out
    assert out_csv.exists()
    assert (tmp_path / "eval_meta.csv").exists()


def test_view_fallback_gallery(tmp_path):
    import cv2
    import pandas as pd
    from workoutdetector_tpu.data.repcount import RepcountHelper
    from workoutdetector_tpu.utils.view import show_one_video

    root = tmp_path / "RepCount"
    frames_dir = root / "rawframes" / "val" / "v1"
    frames_dir.mkdir(parents=True)
    for i in range(1, 30):
        cv2.imwrite(str(frames_dir / f"img_{i:05}.jpg"),
                    np.full((40, 40, 3), i * 8 % 255, np.uint8))
    pd.DataFrame({
        "name": ["v1.mp4"], "class_": ["squat"], "split": ["val"],
        "count": [1], "reps": ["2 20"], "vid": ["x"], "start": [0], "end": [30],
    }).to_csv(root / "annotation.csv")
    helper = RepcountHelper(str(root), str(root / "annotation.csv"))
    out = show_one_video(helper, "v1.mp4", out_path=str(tmp_path / "g.png"))
    assert out is not None and os.path.exists(out)


def test_image_folder_dataset(tmp_path):
    import cv2
    from workoutdetector_tpu.data.image_folder import ImageFolderDataset

    for cls in ("situp", "squat"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            cv2.imwrite(str(d / f"{i}.jpg"), np.full((32, 32, 3), 100, np.uint8))
    ds = ImageFolderDataset(str(tmp_path))
    assert len(ds) == 6
    assert ds.classes == ["situp", "squat"]
    img, label = ds[0]
    assert img.shape == (1, 32, 32, 3)
    assert label == 0
    img2, label2 = ds[5]
    assert label2 == 1


def test_kinetics_rawframe_list(tmp_path):
    import pandas as pd
    from workoutdetector_tpu.data.kinetics import split_to_rawframe_list

    labels_csv = tmp_path / "labels.csv"
    pd.DataFrame({"id": [0, 1], "name": ["abseiling", "archery"]}).to_csv(
        labels_csv, index=False)
    split_csv = tmp_path / "validate.csv"
    pd.DataFrame({
        "label": ["abseiling", "archery", "archery"],
        "youtube_id": ["vidA", "vidB", "missing"],
        "time_start": [10, 0, 5],
        "time_end": [20, 10, 15],
        "split": ["validate"] * 3,
    }).to_csv(split_csv, index=False)
    frames = tmp_path / "rawframes"
    for stem in ("vidA_000010_000020", "vidB"):
        d = frames / stem
        d.mkdir(parents=True)
        for i in range(1, 4):
            (d / f"img_{i:05}.jpg").touch()
    out = tmp_path / "val.txt"
    n = split_to_rawframe_list(str(split_csv), str(frames), str(out),
                               labels_csv=str(labels_csv))
    assert n == 2  # 'missing' skipped
    lines = sorted(open(out).read().strip().splitlines())
    assert lines == ["vidA_000010_000020 3 0", "vidB 3 1"]
