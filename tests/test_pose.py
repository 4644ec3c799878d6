"""In-framework pose extraction (VERDICT r1 item #10): TopDownPose
heatmap model trains on synthetic keypoint fixtures, and
scripts/pose.inference_one_video produces the reference's (P, T, 17, ·)
pickle schema end-to-end on a real mp4, rendered by the existing
visualizer."""

import os
import pickle

import numpy as np
import pytest

from workoutdetector_tpu.data.synthetic import pose_dataset, pose_scene
from workoutdetector_tpu.models.pose import (NUM_KEYPOINTS, decode_keypoints,
                                             keypoint_targets, train_pose)
from workoutdetector_tpu.scripts.pose import (extract_dataset,
                                              inference_one_video,
                                              load_pose_pickle,
                                              render_pose_video)

SIZE = 64


@pytest.fixture(scope="module")
def estimator():
    imgs, kps = pose_dataset(48, size=SIZE, seed=0)
    return train_pose(imgs, kps, steps=200, lr=2e-3, batch=8)


def test_keypoint_targets_and_decode_roundtrip():
    kps = np.stack([np.linspace(6, SIZE - 6, NUM_KEYPOINTS),
                    np.linspace(SIZE - 6, 6, NUM_KEYPOINTS)], axis=-1)
    maps = keypoint_targets(kps, SIZE, stride=4)
    assert maps.shape == (SIZE // 4, SIZE // 4, NUM_KEYPOINTS)
    xy, score = decode_keypoints(maps[None], stride=4)
    err = np.abs(xy[0] - kps).mean()
    assert err <= 4.0, err  # within one heatmap cell
    # peak cell value: 1.0 minus quantization of the fractional center
    assert (score > 0.7).all()


def test_pose_learns_synthetic_keypoints(estimator):
    rng = np.random.default_rng(42)
    errs = []
    for _ in range(8):
        clip, gt = pose_scene(rng, size=SIZE, t=1)
        kp3 = estimator.estimate_clip(clip)
        errs.append(np.abs(kp3[0, :, :2] - gt[0]).mean())
    mean_err = float(np.mean(errs))
    # mean joint error under 10% of the image side on held-out scenes
    assert mean_err < 0.1 * SIZE, f"mean kp error {mean_err:.1f}px"


def test_inference_one_video_schema(estimator, tmp_path):
    import cv2
    rng = np.random.default_rng(5)
    clip, gt = pose_scene(rng, size=SIZE, t=12)
    path = str(tmp_path / "pose.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                        (SIZE, SIZE))
    for f in clip:
        w.write(f[..., ::-1])  # RGB → BGR
    w.release()

    item = inference_one_video(path, pose_estimator=estimator)
    assert item["keypoint"].shape == (1, 12, NUM_KEYPOINTS, 2)
    assert item["keypoint_score"].shape == (1, 12, NUM_KEYPOINTS)
    assert item["img_shape"] == (SIZE, SIZE)
    assert item["total_frames"] == 12
    # keypoints land near gt despite codec noise
    err = np.abs(item["keypoint"][0] - gt).mean()
    assert err < 0.15 * SIZE, err

    # pickle roundtrip + rendering through the existing visualizer
    pkl = str(tmp_path / "pose.pkl")
    extract_dataset([path], pkl, pose_estimator=estimator)
    items = load_pose_pickle(pkl)
    assert len(items) == 1
    out_mp4 = str(tmp_path / "render.mp4")
    render_pose_video(items[0], out_mp4, video_path=path, thre=0.2)
    assert os.path.getsize(out_mp4) > 0


def test_pose_save_load_roundtrip(estimator, tmp_path):
    path = str(tmp_path / "pose.msgpack")
    estimator.save(path)
    from workoutdetector_tpu.models.pose import PoseEstimator
    loaded = PoseEstimator.load(path, input_size=SIZE)
    rng = np.random.default_rng(9)
    clip, _ = pose_scene(rng, size=SIZE, t=2)
    np.testing.assert_allclose(loaded.estimate_clip(clip),
                               estimator.estimate_clip(clip), atol=1e-5)
