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
    PersonCrop stays shape-stable. NOTE the honest limitation this probe
    documented: per-clip union boxes grow to ~99% of the frame on real
    footage (sensor noise + compression spread the temporal diffs), so
    PersonCrop is nearly a no-op here — the learned backend
    (models/detector.py) is the quality path, as docs/ say."""
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
