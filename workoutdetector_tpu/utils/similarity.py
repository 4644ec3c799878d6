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


def _cell_features(frames: np.ndarray, grid: int) -> np.ndarray:
    """(T, H, W, 3) frames → (grid², T, D) per-cell pixel features,
    z-scored per dimension over time (removes the static background and
    equalizes contrast across cells)."""
    t, h, w, _ = frames.shape
    ch, cw = h // grid, w // grid
    x = np.asarray(frames[:, :ch * grid, :cw * grid], np.float32)
    x = x.reshape(t, grid, ch, grid, cw, 3).transpose(1, 3, 0, 2, 4, 5)
    x = x.reshape(grid * grid, t, ch * cw * 3)
    mu = x.mean(axis=1, keepdims=True)
    sd = x.std(axis=1, keepdims=True)
    return (x - mu) / np.maximum(sd, 1e-6)


def spatial_lag_profiles(frames: np.ndarray, grid: int = 4) -> np.ndarray:
    """Per-cell temporal lag profiles of a video (T, H, W, 3).

    Global frame features wash out small localized motion (a low-motion
    arm raise is ~2% of the pixels; the reference's own example
    ``4-YmQKoHYmw.mp4`` finds no global period). Splitting the frame
    into a grid×grid cell array and computing an independent lag profile
    per cell keeps localized periodicity visible in its own cells.

    Per cell: pixels are z-scored over time (removes the static
    background and equalizes contrast so a dim cell can still carry the
    strongest *relative* periodicity), then row-normalized and fed
    through one batched device matmul — einsum('gtd,gsd->gts') — whose
    k-diagonals average into the profiles.

    Returns:
        (grid*grid, T//2 - 1) array of lag profiles.
    """
    import jax.numpy as jnp
    t = frames.shape[0]
    f = jnp.asarray(_cell_features(frames, grid))
    norm = jnp.linalg.norm(f, axis=2, keepdims=True)
    f = f / jnp.maximum(norm, 1e-12)
    sim = np.asarray(jnp.einsum("gtd,gsd->gts", f, f))
    ks = np.arange(1, max(t // 2, 2))
    prof = np.empty((grid * grid, len(ks)), np.float32)
    for g in range(grid * grid):
        for i, k in enumerate(ks):
            prof[g, i] = float(np.mean(np.diagonal(sim[g], offset=k)))
    return prof


def _comb_period(prof: np.ndarray, min_period: int) -> Tuple[int, float]:
    """estimate_period's comb scoring over one precomputed lag profile."""
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
    end = 1
    while end < len(qualified) and qualified[end] == qualified[end - 1] + 1:
        end += 1
    cluster = qualified[:end]
    offset = int(cluster[0] - periods[0])
    cscores = scores[offset:offset + len(cluster)]
    p = int(cluster[int(np.argmax(cscores))])
    return p, float(scores[p - int(periods[0])])


def estimate_period_spatial(frames: np.ndarray,
                            grid: int = 4,
                            min_period: int = 4) -> Tuple[int, float]:
    """Fundamental period via the strongest grid cell (localized motion).

    Each cell's profile is comb-scored independently; the winning
    (period, strength) is the strongest cell. Strengths are comparable
    across cells because every cell is z-scored to unit variance first.
    """
    profs = spatial_lag_profiles(frames, grid=grid)
    best: Tuple[int, float] = (0, 0.0)
    for g in range(profs.shape[0]):
        p, s = _comb_period(profs[g], min_period)
        if s > best[1]:
            best = (p, s)
    return best


def _count_cycles(cell_feats: np.ndarray, period: int) -> int:
    """Count oscillation cycles of a cell's dominant motion component.

    The first principal component of the (T, D) z-scored cell features
    is the cell's motion waveform; one rep = one full cycle = two
    median-crossings. Crossings closer than period/3 are noise and
    dropped. n cycles observed end-to-end show 2n−1..2n+1 *interior*
    crossings (a crossing exactly at the first/last sample is invisible
    to diff), so count = (crossings + 1) // 2 — exact on synthetic
    full-duration oscillations across periods 20-60. Compared to
    round(T/period) this ignores inactive lead-in/lead-out frames (no
    crossings there) and tolerates period drift.
    """
    f = cell_feats - cell_feats.mean(axis=0, keepdims=True)
    u, sv, _ = np.linalg.svd(f, full_matrices=False)
    sig = u[:, 0] * sv[0]
    k = max(3, period // 4)
    padded = np.pad(sig, k, mode="reflect")  # zero-pad dents the edges
    smooth = np.convolve(padded, np.ones(k) / k, mode="same")[k:-k]
    sign = np.sign(smooth - np.median(smooth))
    changes = np.nonzero(np.diff(sign) != 0)[0]
    kept: list = []
    for c in changes:
        if not kept or c - kept[-1] >= period / 3:
            kept.append(int(c))
    return (len(kept) + 1) // 2


def count_by_spatial_periodicity(frames: np.ndarray,
                                 grid: int = 8,
                                 min_period: int = 4,
                                 min_strength: float = 0.05
                                 ) -> Tuple[int, int, float]:
    """Training-free rep counting from raw frames via per-cell
    periodicity (see spatial_lag_profiles): the strongest grid cell
    provides the period, and its motion waveform is cycle-counted.

    When the waveform's crossing count covers at least ~60% of the
    cycles the period implies, the crossing count wins (it trims
    inactive lead-in/out, which duration/period overcounts); a waveform
    too noisy for crossings falls back to round(T / period).

    Measured on the reference's shipped real videos
    (tools/real_video_eval.py, 2026-08-17): raw MAE 0.5 / 4-of-4 within
    one, vs 2.0 / 3-of-4 for global CNN-feature periodicity — the
    localized low-motion arm clip the global counter missed entirely is
    recovered by its own cells.

    Returns:
        (count, period_frames, strength); count 0 when no cell's
        periodicity clears ``min_strength``.
    """
    t = len(frames)
    if t < 2 * min_period:
        return 0, 0, 0.0
    cells = _cell_features(frames, grid)
    profs = spatial_lag_profiles(frames, grid=grid)
    best_g, period, strength = 0, 0, 0.0
    for g in range(profs.shape[0]):
        p, s = _comb_period(profs[g], min_period)
        if s > strength:
            best_g, period, strength = g, p, s
    if period <= 0 or strength < min_strength:
        return 0, period, strength
    by_duration = int(round(t / period))
    by_cycles = _count_cycles(cells[best_g], period)
    if by_cycles >= 0.6 * t / period:
        return by_cycles, period, strength
    return by_duration, period, strength


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
