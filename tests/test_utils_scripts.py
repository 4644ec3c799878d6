"""Tests for export, visualization, similarity, scripts, Countix loader."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn


# ---------------------------------------------------------------- export
def test_export_roundtrip(tmp_path):
    from workoutdetector_tpu.models import TSM
    from workoutdetector_tpu.utils.export import export_model, load_exported

    model = TSM(num_class=3, num_segments=4, base_model="resnet18", dropout=0.0)
    x0 = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)
    path = export_model(model, variables, str(tmp_path / "model"),
                        input_shape=(2, 4, 32, 32, 3), labels=["a", "b", "c"])
    assert path.endswith(".jaxm")
    loaded = load_exported(path)
    assert loaded.input_shape == (2, 4, 32, 32, 3)
    assert loaded.meta["labels"] == ["a", "b", "c"]

    x = np.random.default_rng(0).integers(0, 256, (2, 4, 32, 32, 3), np.uint8)
    got = np.asarray(loaded(jnp.asarray(x)))
    from workoutdetector_tpu.ops.preprocess import normalize_clip
    want = np.asarray(model.apply(variables, normalize_clip(jnp.asarray(x))))
    np.testing.assert_allclose(got, want, atol=1e-5)


# ------------------------------------------------------------- visualize
def test_plot_score_json_and_pred(tmp_path):
    from workoutdetector_tpu.utils.visualize import plot_pred, plot_score_json

    scores = {str(i * 8): {"0": 0.9 if (i // 3) % 2 == 0 else 0.1,
                           "1": 0.1 if (i // 3) % 2 == 0 else 0.9}
              for i in range(12)}
    info = dict(video_name="v.mp4", action="squat", ground_truth=[0, 24, 24, 48],
                scores=scores)
    p = tmp_path / "v.score.json"
    json.dump(info, open(p, "w"))
    out = tmp_path / "v.png"
    res = plot_score_json(str(p), str(out))
    assert out.exists() and out.stat().st_size > 0
    assert res["count"] >= 1

    out2 = tmp_path / "pred.png"
    plot_pred(res["reps"], info["ground_truth"], 96, info, out_path=str(out2))
    assert out2.exists()


def test_vis_2d_pose(tmp_path):
    from workoutdetector_tpu.utils.visualize import vis_2d_pose

    t = 5
    kp = np.zeros((1, t, 17, 2), np.float32)
    kp[..., 0] = np.linspace(20, 80, 17)
    kp[..., 1] = np.linspace(20, 80, 17)
    frames = np.zeros((t, 100, 100, 3), np.uint8)
    out = vis_2d_pose(kp, np.ones((1, t, 17)), frames=frames,
                      out_path=str(tmp_path / "pose.mp4"))
    assert out.shape == (t, 100, 100, 3)
    assert out.sum() > 0  # skeleton drawn
    assert (tmp_path / "pose.mp4").exists()


# ------------------------------------------------------------ similarity
def test_cosine_self_similarity():
    from workoutdetector_tpu.utils.similarity import (cosine_self_similarity,
                                                      pose_self_similarity)

    f = np.asarray([[1, 0], [0, 1], [1, 0]], np.float32)
    mat = cosine_self_similarity(f)
    assert mat.shape == (3, 3)
    np.testing.assert_allclose(np.diag(mat), 0, atol=1e-6)
    assert mat[0, 2] == pytest.approx(0, abs=1e-6)  # identical → distance 0
    assert mat[0, 1] == pytest.approx(1, abs=1e-6)  # orthogonal → 1

    kp = np.random.default_rng(0).standard_normal((4, 17, 2)).astype(np.float32)
    assert pose_self_similarity(kp).shape == (4, 4)


# --------------------------------------------------------------- scripts
def test_relabel_roundtrip(tmp_path):
    from workoutdetector_tpu.scripts.relabel import (name_to_png,
                                                     process_screenshot,
                                                     relabeled_csv_to_rawframe_list,
                                                     screenshots_to_csv)

    # golden from reference mpvscreenshot_process.py:22-25
    assert process_screenshot("stu2_48.mp4_00_00_09.943.png") == \
        ("stu2_48.mp4", 9.943)
    png = name_to_png("v.mp4", 9.943)
    assert process_screenshot(png) == ("v.mp4", 9.943)

    shots = tmp_path / "shots"
    for split in ("train", "val", "test"):
        (shots / split).mkdir(parents=True)
    for sec in ("01.000", "02.000", "03.000", "04.000", "05.000", "06.000"):
        (shots / "train" / f"v1.mp4_00_00_{sec}.png").touch()
    csv_path = tmp_path / "relabel.csv"
    screenshots_to_csv(str(shots), str(csv_path))
    out = tmp_path / "lists"
    relabeled_csv_to_rawframe_list(str(csv_path), str(out), video_fps=30)
    lines = open(out / "train.txt").read().strip().splitlines()
    assert len(lines) == 4  # 2 reps × 2 half-segments
    for ln in lines:
        parts = ln.split()
        assert len(parts) == 4
        assert int(parts[2]) > 0


def test_parse_onedrive():
    from workoutdetector_tpu.scripts.download import parse_onedrive

    url = parse_onedrive("https://1drv.ms/u/s!AiohV3HRf-34ipk0i1y2P1txpKYXFw")
    assert url.startswith("https://api.onedrive.com/v1.0/shares/u!")
    assert url.endswith("/root/content")
    with pytest.raises(AssertionError):
        parse_onedrive("https://example.com/x")


def test_build_workout(tmp_path):
    from workoutdetector_tpu.scripts.build_datasets import build_workout

    data_root = tmp_path / "data"
    # fake source label lists + class files
    for ds, splits in (("RepCount", ("train", "val", "test")),
                       ("Countix", ("train", "val"))):
        d = data_root / ds / "rawframes"
        d.mkdir(parents=True)
        for split in splits:
            with open(d / f"{split}.txt", "w") as f:
                f.write("vid1 100 0\nvid2 80 1\n")
            (d / split).mkdir()
    anno_root = tmp_path / "datasets"
    (anno_root / "RepCount").mkdir(parents=True)
    (anno_root / "Countix").mkdir(parents=True)
    repcount_classes = ["front_raise", "pull_up", "squat", "bench_pressing",
                        "jumping_jack", "situp", "push_up", "battle_rope",
                        "others"]
    countix_classes = ["arm", "bench", "fr", "sq", "jj", "lu", "mc", "pu",
                       "pushup", "situp"]
    (anno_root / "RepCount" / "classes.txt").write_text("\n".join(repcount_classes))
    (anno_root / "Countix" / "classes.txt").write_text("\n".join(countix_classes))

    build_workout(data_root=str(data_root),
                  repcount_classes_path=str(anno_root / "RepCount/classes.txt"),
                  countix_classes_path=str(anno_root / "Countix/classes.txt"))
    out = data_root / "Workout" / "rawframes"
    train = open(out / "train.txt").read().strip().splitlines()
    # 2 repcount lines (classes 0,1 kept) + 2 countix lines
    assert len(train) == 4
    assert train[0].startswith("RepCount/train/")
    assert train[2].startswith("Countix/train/")
    test_lines = open(out / "test.txt").read().strip().splitlines()
    assert len(test_lines) == 2  # repcount only
    assert (out / "RepCount" / "train").is_symlink()


def test_bbox_json_and_cut(tmp_path):
    import cv2
    from workoutdetector_tpu.scripts.bbox import bboxes_to_json
    from workoutdetector_tpu.scripts.cut import cut_video

    p = tmp_path / "v.mp4"
    w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"), 30, (96, 96))
    for t in range(60):
        f = np.full((96, 96, 3), 80, np.uint8)
        f[30:60, (t * 2) % 60:(t * 2) % 60 + 20] = 250
        w.write(f)
    w.release()

    d = bboxes_to_json(str(p), str(tmp_path / "b.json"))
    assert d["total_frames"] == 60
    assert len(d["boxes"]) == 60
    assert any(len(b) == 4 for b in d["boxes"])  # motion found

    out = cut_video(str(tmp_path), "v", 0.5, 1.5, str(tmp_path / "cuts"))
    assert os.path.exists(out)
    from workoutdetector_tpu.data.video import VideoReader
    with VideoReader(out) as r:
        assert 25 <= len(r.read_raw()) <= 35  # ~1 sec at 30 fps


def test_extract_frames(tmp_path):
    import cv2
    from workoutdetector_tpu.scripts.extract_frames import extract_video

    p = tmp_path / "v.mp4"
    w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 64))
    for i in range(10):
        w.write(np.full((64, 64, 3), i * 20, np.uint8))
    w.release()
    n = extract_video(str(p), str(tmp_path / "frames"))
    assert n == 10
    assert (tmp_path / "frames" / "img_00001.jpg").exists()
    assert (tmp_path / "frames" / "img_00010.jpg").exists()


def test_countix_loader(tmp_path):
    import pandas as pd
    from workoutdetector_tpu.data.countix import Countix

    anno_root = tmp_path / "Countix"
    anno_root.mkdir()
    for split in ("train", "val"):
        pd.DataFrame({
            "video_id": [f"{split}_vid{i}" for i in range(3)],
            "class": ["squat"] * 3,
            "kinetics_start": [0] * 3,
            "kinetics_end": [10] * 3,
            "repetition_start": [0.0] * 3,
            "repetition_end": [9.5] * 3,
            "count": [5, 7, 9],
        }).to_csv(anno_root / f"workouts_{split}.csv", index=False)
    c = Countix(anno_root=str(anno_root), data_root=str(tmp_path / "data"))
    assert len(c.anno_all) == 6
    assert c.get_count("train_vid1") == 7
    assert c.get_video("val_vid0").endswith("val/val_vid0.mp4")
    with pytest.raises(ValueError):
        c.get_count("nope")


def test_compare_scores(tmp_path):
    import json as _json
    from workoutdetector_tpu.scripts.compare_scores import compare_dirs

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir(); b.mkdir()
    scores = {str(i * 8): {"0": 0.9 - i * 0.1, "1": 0.1 + i * 0.1}
              for i in range(4)}
    _json.dump({"scores": scores}, open(a / "v.score.json", "w"))
    # identical copy → perfect agreement
    _json.dump({"scores": scores}, open(b / "v.score.json", "w"))
    res = compare_dirs(str(a), str(b))
    assert res["videos"] == 1
    assert res["max_abs_score_delta"] == 0.0
    assert res["mean_argmax_agreement"] == 1.0
    assert res["count_agreement"] == 1.0
    # perturbed copy → deltas appear
    scores2 = {k: {"0": v["0"] + 0.05, "1": v["1"]} for k, v in scores.items()}
    _json.dump({"scores": scores2}, open(b / "v.score.json", "w"))
    res2 = compare_dirs(str(a), str(b))
    assert abs(res2["max_abs_score_delta"] - 0.05) < 1e-9


def test_video_reader_chunked_native_decode(tmp_path):
    """The native decode paths allocate from the container's frame count
    in bounded chunks (a flat 100k-frame preallocation was ~600 GB for
    HD sources). Forcing tiny chunks must give bit-identical frames."""
    import cv2

    from workoutdetector_tpu.data.video import VideoReader

    p = tmp_path / "chunks.mp4"
    w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for i in range(37):
        w.write(np.full((48, 64, 3), (i * 5) % 256, np.uint8))
    w.release()

    with VideoReader(str(p)) as r:
        whole = r.read_raw()
    assert whole.shape[0] == 37 and whole.shape[1:] == (48, 64, 3)

    class Tiny(VideoReader):
        _CHUNK_BYTES = 48 * 64 * 3 * 4  # 4 frames per chunk

    with Tiny(str(p)) as r:
        chunked = r.read_raw()
    np.testing.assert_array_equal(whole, chunked)

    with Tiny(str(p)) as r:
        prepped = r.read_prepped(scale=48, crop=32, max_frames=10)
    assert prepped.shape == (10, 32, 32, 3)


def test_name_to_png_hour_rollover_and_ms():
    from workoutdetector_tpu.scripts.relabel import name_to_png, process_screenshot
    # 1h 1m 1s: minutes must roll over, not read 61
    assert name_to_png("v.mp4", 3661.0) == "v.mp4_01_01_01.000.png"
    # integer seconds have no phantom milliseconds
    assert name_to_png("v.mp4", 9) == "v.mp4_00_00_09.000.png"
    # fractional seconds keep exactly three digits
    assert name_to_png("v.mp4", 9.9435).endswith("_00_00_09.944.png")
    # round-trips through the parser
    name, sec = process_screenshot("x/v.mp4_01_01_01.000.png")
    assert (name, sec) == ("v.mp4", 3661.0)


def test_cut_video_resamples_fps(tmp_path):
    """A 60fps source cut to [0,2) must yield a 2-second clip at 30fps
    (the reference's ffmpeg fps filter), not a 4-second half-speed one."""
    import cv2

    from workoutdetector_tpu.scripts.cut import cut_video
    from workoutdetector_tpu.data.video import VideoReader

    src = tmp_path / "fast.mp4"
    w = cv2.VideoWriter(str(src), cv2.VideoWriter_fourcc(*"mp4v"), 60,
                        (64, 48))
    for i in range(120):  # 2 s at 60 fps
        w.write(np.full((48, 64, 3), i * 2, np.uint8))
    w.release()
    out = cut_video(str(tmp_path), "fast", 0.0, 2.0, str(tmp_path / "cuts"))
    with VideoReader(out) as r:
        n, fps = r.frame_count, r.fps
    assert abs(fps - 30.0) < 0.5
    assert abs(n - 60) <= 2, n  # ~2 s of 30 fps output


def test_compare_scores_skips_incomparable(tmp_path):
    import json

    from workoutdetector_tpu.scripts.compare_scores import compare_dirs

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()
    sc = {"0": {"0": 0.9, "1": 0.1}, "8": {"0": 0.2, "1": 0.8}}
    for d in (a, b):
        (d / "same.score.json").write_text(json.dumps({"scores": sc}))
    # different window keys: not comparable, must not count as disagreement
    (a / "other.score.json").write_text(json.dumps({"scores": {"0": {"0": 1.0}}}))
    (b / "other.score.json").write_text(json.dumps({"scores": {"4": {"0": 1.0}}}))
    res = compare_dirs(str(a), str(b), threshold=0.0, softmax=False)
    assert res["skipped_no_common_windows"] == 1
    assert res["count_agreement"] == 1.0


def test_export_folds_timesformer_tfc(tmp_path):
    """export_model serializes the t_fc-folded graph (same rewrite set as
    InferenceEngine) and the artifact's logits match the UNfolded live
    model — the fold is exact in fp32."""
    import jax
    import jax.numpy as jnp
    from workoutdetector_tpu.models.timesformer import TimeSformer
    from workoutdetector_tpu.ops.preprocess import normalize_clip
    from workoutdetector_tpu.utils.export import export_model, load_exported

    model = TimeSformer(num_class=3, num_segments=4, image_size=32,
                        patch_size=8, embed_dims=32, num_layers=2,
                        num_heads=2, dtype=jnp.float32)
    x0 = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    params = {k: (dict(b) if isinstance(b, dict) else b)
              for k, b in v["params"].items()}
    for k, blk in params.items():  # t_fc is zero-init: randomize so the
        if k.startswith("block_"):  # fold is load-bearing
            rng = jax.random.PRNGKey(abs(hash(k)) % (2 ** 31))
            blk["t_fc"] = {"kernel": 0.1 * jax.random.normal(
                rng, blk["t_fc"]["kernel"].shape),
                "bias": jnp.full_like(blk["t_fc"]["bias"], 0.05)}
    v = {"params": params}

    path = export_model(model, v, str(tmp_path / "tsf"),
                        input_shape=(2, 4, 32, 32, 3))
    x_u8 = np.random.default_rng(0).integers(
        0, 256, (2, 4, 32, 32, 3), dtype=np.uint8)
    live = np.asarray(model.apply(v, normalize_clip(jnp.asarray(x_u8)),
                                  train=False))
    np.testing.assert_allclose(np.asarray(load_exported(path)(x_u8)), live,
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("model_type",
                         ["tsm", "tdn", "tpn", "timesformer", "repnet"])
def test_export_cli_every_video_family(tmp_path, model_type):
    """The export CLI must produce a loadable .jaxm for EVERY video model
    family — it derives the traced shape from factory.example_input
    (a hand-built rank-5 shape made TDN export impossible and traced
    TimeSformer at the wrong size)."""
    from workoutdetector_tpu.models.factory import example_input
    from workoutdetector_tpu.scripts.export_model import main as export_main
    from workoutdetector_tpu.utils.export import load_exported
    from workoutdetector_tpu.config import Config

    out = str(tmp_path / f"{model_type}")
    opts = ["model.model_type", model_type, "model.num_class", "3",
            "model.num_segments", "4", "model.dtype", "float32",
            "data.image_size", "32"]
    if model_type == "timesformer":
        opts += ["model.base_model", "tiny", "model.image_size", "32",
                 "model.patch_size", "8", "model.embed_dims", "32",
                 "model.num_layers", "1", "model.num_heads", "2"]
    elif model_type == "repnet":
        opts += ["model.base_model", "tiny"]
    else:
        opts += ["model.base_model",
                 "resnet50" if model_type == "tdn" else "resnet18"]
    export_main(["--cpu", "-o", out, "--batch", "2"] + opts)

    cfg = Config()
    cfg.merge_opts(opts)
    m = load_exported(out + ".jaxm")
    x = np.zeros(example_input(cfg.model, batch=2, image_size=32).shape,
                 np.uint8)
    logits = np.asarray(m(x))
    if model_type == "repnet":
        # repnet artifacts carry the PER-FRAME logits graph (counting
        # needs it); num_class is derived = num_segments // 2
        assert logits.shape == (2, 4, 2)
    else:
        assert logits.shape == (2, 3)
    assert m.meta.get("model_type") == model_type
