"""Self-similarity analysis (RepNet-style periodicity inspection).

Capability match of reference workoutdetector/utils/common.py:44-250:
pose / CNN-feature cosine self-similarity heatmaps over a video. Feature
extraction runs through this framework's own ResNet on device (instead of
timm+torch), batched and jit-compiled; the similarity matrix itself is one
device matmul.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

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
    # scale tracks the crop (224-crop ⇒ 256-scale convention): a fixed
    # 256 with a small crop (e.g. the 64-px feature engine) would keep
    # only the central ~6% of the frame and miss off-center motion
    scale = max(engine.image_size, round(engine.image_size * 256 / 224))
    with VideoReader(video_path) as r:
        frames = r.read_prepped(scale, engine.image_size)
    return engine.score_images(frames)


def lag_profile(features: np.ndarray) -> np.ndarray:
    """(T, D) features → (T//2,) mean cosine similarity at each temporal
    lag k (the k-th diagonal of the self-similarity matrix, averaged).

    A periodic motion with period p produces peaks at k = p, 2p, 3p, …
    This is the RepNet-style periodicity signal computed as one device
    matmul + diagonal reductions (the reference only plots the matrix,
    notebooks/similarity_image.ipynb; here it also drives a counter)."""
    import jax.numpy as jnp
    f = jnp.asarray(features, jnp.float32)
    f = f - jnp.mean(f, axis=0, keepdims=True)  # remove DC so constant
    # backgrounds don't flatten the profile
    norm = jnp.linalg.norm(f, axis=1, keepdims=True)
    f = f / jnp.maximum(norm, 1e-12)
    sim = f @ f.T
    t = f.shape[0]
    ks = np.arange(1, max(t // 2, 2))
    prof = np.empty(len(ks), np.float32)
    s = np.asarray(sim)
    for i, k in enumerate(ks):
        prof[i] = float(np.mean(np.diagonal(s, offset=k)))
    return prof


def estimate_period(features: np.ndarray,
                    min_period: int = 4) -> Tuple[int, float]:
    """Fundamental period of (T, D) features via comb-scored lag profile.

    Scores each candidate period p by the mean lag-profile value at its
    multiples minus the profile mean (so a flat/aperiodic profile scores
    ~0). A period's multiples (2p, 3p, …) hit the same peaks and score
    within noise of the fundamental, so among candidates within 5% of
    the best score the SMALLEST period wins (subharmonic suppression —
    half-periods never qualify: their lag is anti-phase and scores low).

    Returns:
        (period_frames, strength) — strength ≤ 0 means no periodicity.
    """
    prof = lag_profile(features)
    t_half = len(prof)
    base = float(np.mean(prof))
    periods = np.arange(min_period, t_half + 1)
    if len(periods) == 0:
        return 0, 0.0
    scores = np.array([
        float(np.mean(prof[np.arange(p, t_half + 1, p) - 1])) - base
        for p in periods])
    best = float(scores.max())
    if best <= 0:
        return int(periods[int(scores.argmax())]), best
    qualified = periods[scores >= 0.95 * best]
    # the fundamental's (possibly broad) peak is the FIRST contiguous
    # cluster of qualified periods; later clusters are its multiples.
    # Within the cluster take the argmax (a 5% shoulder at p−1 must not
    # shave the period).
    end = 1
    while end < len(qualified) and qualified[end] == qualified[end - 1] + 1:
        end += 1
    cluster = qualified[:end]
    offset = int(cluster[0] - periods[0])
    cscores = scores[offset:offset + len(cluster)]
    p = int(cluster[int(np.argmax(cscores))])
    return p, float(scores[p - int(periods[0])])


def count_by_periodicity(features: np.ndarray,
                         min_period: int = 4,
                         min_strength: float = 0.05) -> Tuple[int, int, float]:
    """Training-free rep counting from per-frame features (CNN features
    or flattened pose keypoints): estimate the fundamental period and
    divide the duration by it.

    This is the one counter that needs NO trained checkpoint — the
    RepNet observation the reference explores in its similarity
    notebook, promoted to a usable counter.

    Returns:
        (count, period_frames, strength); count 0 when no periodic
        structure clears ``min_strength``.
    """
    feats = np.asarray(features)
    if len(feats) < 2 * min_period:
        return 0, 0, 0.0
    period, strength = estimate_period(feats, min_period=min_period)
    if period <= 0 or strength < min_strength:
        return 0, period, strength
    return int(round(len(feats) / period)), period, strength


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
