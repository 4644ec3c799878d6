"""Self-similarity analysis (RepNet-style periodicity inspection).

Capability match of reference workoutdetector/utils/common.py:44-250:
pose / CNN-feature cosine self-similarity heatmaps over a video. Feature
extraction runs through this framework's own ResNet on device (instead of
timm+torch), batched and jit-compiled; the similarity matrix itself is one
device matmul.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def cosine_self_similarity(features: np.ndarray) -> np.ndarray:
    """(T, D) features → (T, T) cosine *distance* matrix (0 = identical),
    matching sklearn pairwise_distances(metric='cosine') used by the
    reference (common.py:70-74)."""
    import jax.numpy as jnp
    f = jnp.asarray(features, jnp.float32)
    norm = jnp.linalg.norm(f, axis=1, keepdims=True)
    f = f / jnp.maximum(norm, 1e-12)
    sim = f @ f.T  # one MXU matmul
    return np.asarray(1.0 - sim)


def pose_self_similarity(keypoints: np.ndarray) -> np.ndarray:
    """(T, 17, 2|3) first-person keypoints → (T, T) cosine distances
    (reference plot_pose_heatmap, common.py:63-76)."""
    kp = np.asarray(keypoints)
    return cosine_self_similarity(kp.reshape(kp.shape[0], -1))


def video_cnn_features(engine: Any, video_path: str,
                       batch: int = 64) -> np.ndarray:
    """Per-frame backbone features of a video (reference video_feature,
    common.py:108-148, timm→our engine).

    Args:
        engine: InferenceEngine over a features_only ResNet (input_rank 4).
    Returns:
        (T, D) feature array.
    """
    from workoutdetector_tpu.data.video import VideoReader
    with VideoReader(video_path) as r:
        frames = r.read_prepped(256, engine.image_size)
    return engine.score_images(frames)


def plot_similarity(mat: np.ndarray,
                    title: str = "",
                    reps: Optional[list] = None,
                    out_path: Optional[str] = None) -> None:
    """Heatmap with optional rep-start markers (common.py:63-76)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(5, 4))
    plt.imshow(mat, cmap="viridis")
    plt.colorbar()
    plt.title(title)
    if reps:
        plt.vlines(reps[::2], colors="r", ymin=0, ymax=len(mat), lw=0.5)
    if out_path:
        plt.savefig(out_path, bbox_inches="tight", dpi=120)
        plt.close()
    else:
        plt.show()
