"""Online repetition counting + dataset scoring/evaluation.

API-compatible rebuild of reference workoutdetector/utils/inference_count.py
(count_by_image_model :192-243, count_by_video_model :285-339,
inference_dataset :342-421, eval_dataset :424-512) on the compiled TPU
engine instead of ONNX sessions. Score JSON format matches the reference
bit-for-bit in structure so downstream eval (counting.eval_score_dir) and
the reference's own notebooks read either.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import time
from bisect import bisect_left
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from workoutdetector_tpu.counting import majority_vote_states, pred_to_count
from workoutdetector_tpu.data.repcount import RepcountHelper
from workoutdetector_tpu.data.video import VideoReader, write_video
from workoutdetector_tpu.infer.engine import InferenceEngine


def write_count_video(video_path: str, output_path: str, reps: List[int],
                      states: Sequence[int], step: int = 8) -> None:
    """Overlay predicted class + running count on the video
    (reference write_to_video, utils/inference_count.py:70-111)."""
    import cv2
    with VideoReader(video_path) as r:
        fps = r.fps or 30.0
        frames = r.read_raw()
    per_frame = np.repeat(np.asarray(states), step)[:len(frames)]
    h, w = frames.shape[1:3]
    out = []
    for idx, f in enumerate(frames[:len(per_frame)]):
        f = f.copy()
        count_idx = bisect_left(reps[::2], idx)
        cv2.putText(f, f"class {int(per_frame[idx])}", (int(w * 0.2), int(h * 0.25)),
                    cv2.FONT_HERSHEY_SIMPLEX, 1, (255, 0, 0), 2)
        cv2.putText(f, f"count {count_idx}", (int(w * 0.25), int(h * 0.5)),
                    cv2.FONT_HERSHEY_SIMPLEX, 1, (237, 136, 12), 2)
        out.append(f)
    if out:
        write_video(output_path, np.stack(out), fps)


def count_by_video_model(engine: InferenceEngine,
                         video_path: str,
                         ground_truth: Optional[List[int]] = None,
                         video_out_path: Optional[str] = None
                         ) -> Tuple[int, List[int]]:
    """Count reps with the 8-frame video state classifier.

    Matches reference count_by_video_model (:285-339): consecutive
    non-overlapping 8-frame chunks → argmax class per chunk →
    pred_to_count(step=8). All chunks of the video are scored in a few
    batched device steps instead of per-chunk ONNX calls.
    """
    with VideoReader(video_path) as r:
        video = r.read_prepped(256, engine.image_size)
    t = len(video)
    n_chunks = t // 8  # reference drops the last partial queue
    if n_chunks == 0:
        return 0, []
    starts = np.arange(0, n_chunks * 8, 8)
    # dense 8-frame windows through the fused device gather when the
    # engine supports it (one H2D + one fused program per video); the
    # host gather_windows loop remains the fallback for .jaxm artifact
    # engines and image-rank models (score_video routes internally)
    _, logits = engine.score_video(video, stride=1, starts=starts)
    states = [int(np.argmax(l)) for l in logits]
    count, reps = pred_to_count(states, step=8)
    if video_out_path is not None:
        write_count_video(video_path, video_out_path, reps, states, step=8)
    return count, reps


def count_by_similarity(feature_engine: InferenceEngine,
                        video_path: str,
                        min_period: int = 4,
                        min_strength: float = 0.05
                        ) -> Tuple[int, int, float]:
    """Training-free rep counting via temporal self-similarity (RepNet
    observation): per-frame backbone features → fundamental period of the
    lag profile → count = duration / period.

    Needs NO trained checkpoint — even a randomly-initialized backbone
    carries enough photometric signal to expose periodic motion (the
    reference demonstrates the heatmap in its similarity notebook,
    utils/common.py:108-148; here it is promoted to a usable counter and
    runs as one device matmul over the feature matrix).

    Args:
        feature_engine: InferenceEngine over a features_only backbone
            (``input_rank=4``, e.g. ``resnet18(num_classes=0)``).

    Returns:
        (count, period_frames, strength); count 0 when no periodic
        structure clears ``min_strength``.
    """
    from workoutdetector_tpu.utils.similarity import (count_by_periodicity,
                                                      video_cnn_features)
    feats = video_cnn_features(feature_engine, video_path)
    return count_by_periodicity(feats, min_period=min_period,
                                min_strength=min_strength)


def count_by_motion_periodicity(video_path: str,
                                grid: int = 8,
                                image_size: int = 64,
                                min_period: int = 4,
                                min_strength: float = 0.05
                                ) -> Tuple[int, int, float]:
    """Training-free rep counting from per-cell pixel periodicity — the
    strongest variant of the similarity counter (no checkpoint AND no
    backbone: decode → one batched device matmul → count).

    Unlike ``count_by_similarity``'s global CNN features, each grid cell
    carries its own lag profile, so small localized motion (an arm in a
    static scene) stays visible; the winning cell's motion waveform is
    cycle-counted (utils.similarity.count_by_spatial_periodicity).
    Measured on the reference's shipped real videos: raw MAE 0.5, 4/4
    within one (tools/real_video_eval.py, docs in STATUS.md).

    Returns:
        (count, period_frames, strength); count 0 when no periodic
        structure clears ``min_strength``.
    """
    from workoutdetector_tpu.utils.similarity import (
        count_by_spatial_periodicity)
    scale = max(image_size, round(image_size * 256 / 224))
    with VideoReader(video_path) as r:
        frames = r.read_prepped(scale, image_size)
    return count_by_spatial_periodicity(frames, grid=grid,
                                        min_period=min_period,
                                        min_strength=min_strength)


def repnet_frame_logits_fn(engine: InferenceEngine):
    """The per-frame period-logits program of a RepNet engine, cached on
    the engine: (window_batch, T, S, S, 3) uint8 → (window_batch, T, C)
    fp32. Live engines jit model.apply with the sown aux logits; .jaxm
    artifacts already serialize exactly this graph
    (utils/export.make_inference_fn repnet branch)."""
    fn = getattr(engine, "_repnet_fn", None)
    if fn is not None:
        return fn
    if engine.model is None:
        assert getattr(engine, "meta", {}).get("model_type") == \
            "repnet", "artifact was not exported from a repnet model"
        fn = engine._fn
    else:
        import jax

        from workoutdetector_tpu.ops.preprocess import normalize_clip
        model = engine.model

        def frame_logits(x_u8):
            _, inter = model.apply(engine.variables, normalize_clip(x_u8),
                                   train=False, mutable=["intermediates"])
            return inter["intermediates"]["aux_logits"][0]

        fn = jax.jit(frame_logits)
    engine._repnet_fn = fn
    return fn


def repnet_frame_logits_batch(engine: InferenceEngine):
    """Batched host-side wrapper over repnet_frame_logits_fn: any-N
    (N, T, S, S, 3) uint8 → (N, T, C), via the engine's shared
    chunk/pad loop (engine.chunked_call) so every device call reuses
    ONE compiled program. This is the score_fn shape the serving
    AsyncBatcher expects."""
    fn = repnet_frame_logits_fn(engine)
    return lambda windows: engine.chunked_call(fn, windows)


def count_by_repnet(engine: InferenceEngine,
                    video_path: str,
                    rates: Sequence[int] = (1, 2, 4, 8),
                    min_periodicity: float = 0.5,
                    grid: bool = False
                    ) -> Tuple[int, int, float]:
    """Count reps with the learnable RepNet period family
    (models/repnet.RepNet trained on SyntheticPeriodicDataset).

    The video is scored at several temporal subsampling rates; the rate
    whose frames look most periodic to the model wins. The count itself
    (Σ 1/period over periodic frames) is rate-invariant, so rate choice
    only affects which frames fall inside the model's period range
    (2..T/2 window frames). Windows are padded to the engine's
    window_batch so every video reuses ONE compiled program.

    ``grid=True`` additionally scores four quadrant crops (decoded once
    at 2× and sliced) and keeps the most periodic view — the same
    localized-motion remedy the similarity counter uses (its spatial
    grid): motion confined to a small region (an arm, a head) is washed
    out in the full-frame downscale but fills a quadrant.

    Returns:
        (count, period_frames, strength): period in original-video
        frames (median over periodic frames), strength = mean periodic
        probability at the winning rate/view.
    """
    from workoutdetector_tpu.models.repnet import (count_from_frame_logits,
                                                   period_of_class)
    t_win = engine.num_segments
    score_windows = repnet_frame_logits_batch(engine)
    s = engine.image_size
    with VideoReader(video_path) as r:
        if grid:
            big = r.read_prepped(round(2 * s * 256 / 224), 2 * s)
            views = [big[:, ::2, ::2], big[:, :s, :s], big[:, :s, s:],
                     big[:, s:, :s], big[:, s:, s:]]
        else:
            views = [r.read_prepped(round(s * 256 / 224), s)]
    best = (0, 0, 0.0)  # (count, period_frames, strength)
    best_strength = -1.0
    for video, rate in ((v, r_) for v in views for r_ in rates):
        xs = video[::rate]
        if len(xs) < 2:
            continue
        n_win = -(-len(xs) // t_win)
        pad = n_win * t_win - len(xs)
        valid = np.arange(n_win * t_win) < len(xs)
        if pad:
            xs = np.concatenate([xs, np.repeat(xs[-1:], pad, axis=0)])
        wins = xs.reshape(n_win, t_win, *xs.shape[1:])
        valid = valid.reshape(n_win, t_win)
        fl = score_windows(wins)  # (n_win, T, C)
        count, strength = count_from_frame_logits(fl, valid,
                                                  min_periodicity)
        if strength > best_strength:
            # median predicted period over periodic frames, in
            # original-video frame units
            p = np.exp(fl - fl.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            periodic = (1.0 - p[..., 0] >= min_periodicity) & valid
            if periodic.any():
                ids = np.argmax(p[..., 1:], -1)[periodic] + 1
                period = int(np.median(period_of_class(ids))) * rate
            else:
                period = 0
            best = (int(round(count)), period, float(strength))
            best_strength = strength
    return best


def count_by_image_model(engine: InferenceEngine,
                         video_path: str,
                         ground_truth: Optional[List[int]] = None,
                         video_out_path: Optional[str] = None,
                         pred_out_path: Optional[str] = None,
                         threshold: float = 0.1) -> Tuple[int, List[int]]:
    """Count reps with a per-frame image state classifier.

    Matches reference count_by_image_model (:192-243): per-frame argmax →
    7-deep majority vote (≥4) → binary state per frame →
    pred_to_count(step=7). Frames are scored in large device batches.

    ``threshold`` implements the reference's *documented* semantics
    (:208 "scores below this threshold will be viewed as background"):
    frames whose max softmax score < threshold become -1 and pred_to_count
    skips them. (The reference documents but never applies it; at the
    default 0.1 a binary softmax max is always ≥ 0.5, so behavior is
    identical to the reference run.)
    """
    with VideoReader(video_path) as r:
        video = r.read_prepped(256, engine.image_size)
    if len(video) == 0:
        return 0, []
    scores = engine.score_images(video)
    argmaxes = np.argmax(scores, axis=1)
    states = majority_vote_states(argmaxes, window=7)
    if threshold > 0:
        e = np.exp(scores - scores.max(axis=1, keepdims=True))
        max_prob = (e / e.sum(axis=1, keepdims=True)).max(axis=1)
        states = [-1 if p < threshold else s
                  for s, p in zip(states, max_prob)]
    count, reps = pred_to_count(states, step=7)
    if pred_out_path is not None:
        d = {"video_path": video_path, "step": 1,
             "scores": {i: s.tolist() for i, s in enumerate(scores)}}
        if not pred_out_path.endswith(".json"):
            pred_out_path += ".json"
        with open(pred_out_path, "w") as f:
            json.dump(d, f)
    if video_out_path is not None:
        write_count_video(video_path, video_out_path, reps, states, step=7)
    return count, reps


def _shard_items(items: List, shard: Tuple[int, int]) -> List:
    """Deterministic disjoint shard of a video list: worker i of n takes
    every n-th item of the name-sorted list. N pod workers each running
    with ``shard=(i, n)`` cover a split exactly once with zero
    coordination — dataset-scale scoring/eval parallelizes across hosts
    the same way the reference parallelizes nothing (its eval loop is
    strictly serial, utils/inference_count.py:424-512)."""
    i, n = shard
    if n < 1 or not 0 <= i < n:
        # validate BEFORE the n==1 fast path: a typo'd shard=(1, 1) must
        # not silently process the whole split as a "partial" result
        raise ValueError(f"invalid shard {shard}: need 0 <= i < n")
    if n == 1:
        return items
    return sorted(items, key=lambda it: it.video_name)[i::n]


def _failures_path(out_dir: str, shard: Tuple[int, int]) -> str:
    """Per-shard failure manifest path: shards share ``out_dir``, so each
    writes its own file. Manifests live under a ``failures/`` subdir so
    the score directory itself stays a pure ``*.score.json`` namespace —
    the reference's executing eval main globs every ``.json`` in it
    (utils/eval.py:117-180) and must keep reading our output unchanged."""
    i, n = shard
    return osp.join(out_dir, "failures", f"shard_{i}of{n}.json")


def _atomic_json_dump(obj, path: str) -> None:
    """Write JSON durably-visible-or-absent: a kill -9 mid-write must
    never leave a truncated file that a resumed shard would trust
    (the reference's save_scores_to_json writes in place AND hard-asserts
    on existing output, utils/inference_count.py:61 — both fixed here)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


class _SweepFailures:
    """Incremental per-shard failure manifest for dataset sweeps.

    Entries persist across restarts: a video that failed in a previous
    run keeps its record until a later run scores it successfully (the
    retry path — files do rot AND get fixed between runs). Flushed
    atomically after every change so a preempted shard leaves an exact
    record of what it could not score."""

    def __init__(self, path: str):
        self.path = path
        self.failed: Dict[str, Dict[str, str]] = {}
        if osp.isfile(path):
            try:
                with open(path) as f:
                    self.failed = json.load(f)
            except (json.JSONDecodeError, OSError):
                self.failed = {}

    def record(self, name: str, stage: str, exc: BaseException) -> None:
        self.failed[name] = {"stage": stage,
                             "error": f"{type(exc).__name__}: {exc}"}
        os.makedirs(osp.dirname(self.path), exist_ok=True)
        _atomic_json_dump(self.failed, self.path)

    def clear(self, name: str) -> None:
        if name in self.failed:
            del self.failed[name]
            _atomic_json_dump(self.failed, self.path)


def inference_dataset(engine: InferenceEngine,
                      splits: List[str],
                      out_dir: str,
                      checkpoint: str,
                      data_root: Optional[str] = None,
                      anno_path: Optional[str] = None,
                      step: int = 8,
                      stride: int = 2,
                      decode_workers: int = 2,
                      shard: Tuple[int, int] = (0, 1),
                      chunk_frames: Optional[int] = None,
                      skip_existing: bool = False,
                      on_error: str = "raise") -> Dict[str, object]:
    """Score every RepCount video → per-video ``.score.json``.

    JSON schema matches reference inference_dataset (:351-421):
    video_name / model / input_shape / checkpoint / total_frames /
    ground_truth / action / scores{start_frame: {class_id: score}}.
    Windows are the sparse 8-of-16 samples every 8 frames (:411-414).

    ``shard=(i, n)`` scores only worker i's disjoint slice of the split
    (see _shard_items); N workers writing into one shared ``out_dir``
    produce exactly the single-process output, so counting.eval_score_dir
    over the merged directory needs no extra step.

    ``chunk_frames`` bounds decode memory per video: frames stream in
    chunks of that many and score as they arrive — bit-identical output
    (engine.score_video_chunked), peak residency chunk_frames + window
    span instead of the whole video (the reference decodes entire videos
    to RAM, :391; a 30-min 224² source is ~4 GB of uint8). Dataset-scale
    sweeps should set it.

    Fault tolerance (beyond the reference, whose sweep loop dies on the
    first bad video at :399 and hard-asserts on existing output at :61):

    * ``skip_existing=True`` resumes a preempted shard — videos whose
      ``.score.json`` already parses are skipped, so a kill -9'd worker
      rerun with the same command line completes exactly the remaining
      work (score JSONs are written atomically, tmp + os.replace, so a
      partial file can never be mistaken for a finished one).
    * ``on_error='skip'`` survives corrupt/unreadable videos: the
      failure is recorded in a per-shard manifest under
      ``out_dir/failures/`` (stage + exception), the sweep continues, and the
      returned summary reports scored/skipped/failed names. A later
      resumed run retries failed videos and clears entries that now
      succeed. ``on_error='raise'`` (default) keeps strict semantics.

    Returns:
        summary dict: ``{"scored": [...], "skipped": [...],
        "failed": {name: {stage, error}}}`` for this shard's slice.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip': {on_error!r}")
    os.makedirs(out_dir, exist_ok=True)
    if data_root is None:
        data_root = osp.expanduser("~/data/RepCount/")
    if anno_path is None:
        anno_path = osp.join(data_root, "annotation.csv")
    helper = RepcountHelper(data_root, anno_path)
    data = helper.get_rep_data(splits, action=["all"])

    device_gather = engine.supports_device_gather
    items = _shard_items(list(data.values()), shard)
    failures = _SweepFailures(_failures_path(out_dir, shard))
    summary: Dict[str, object] = {"scored": [], "skipped": [],
                                  "failed": failures.failed}

    if skip_existing:
        remaining = []
        for item in items:
            path = osp.join(out_dir, f"{item.video_name}.score.json")
            done = False
            if osp.isfile(path):
                try:  # pre-atomic-write files could be truncated
                    with open(path) as f:
                        json.load(f)
                    done = True
                except (json.JSONDecodeError, OSError):
                    done = False
            if done:
                summary["skipped"].append(item.video_name)
                failures.clear(item.video_name)
            else:
                remaining.append(item)
        items = remaining
    if not items:
        return summary

    def finish(item) -> None:
        summary["scored"].append(item.video_name)
        failures.clear(item.video_name)

    def fail(item, stage: str, exc: BaseException) -> None:
        if on_error == "raise":
            raise exc
        failures.record(item.video_name, stage, exc)

    if chunk_frames is not None:
        # bounded-memory path: decode+score interleave per video, so the
        # cross-video decode pipeline below (whole videos in worker
        # threads) would defeat the bound — stream serially instead
        from workoutdetector_tpu.infer.engine import score_video_chunked
        for item in items:
            try:
                n_frames, starts, logits = score_video_chunked(
                    engine, item.video_path, step=step, stride=stride,
                    chunk_frames=chunk_frames)
                _write_score_json(engine, item, n_frames, starts, logits,
                                  checkpoint, out_dir)
            except Exception as e:
                fail(item, "score", e)
            else:
                finish(item)
        return summary

    def decode(it):
        with VideoReader(it.video_path) as r:
            video = r.read_prepped(256, engine.image_size)
        if device_gather:
            # stage the H2D copy from the worker thread too: the uint8
            # transfer of video k+1 overlaps video k's device compute
            # (H2D binds on thin links — see engine.stage_video)
            return engine.stage_video(video), len(video)
        return video, len(video)

    # pipelined host decode (+H2D staging): the next videos decode on
    # worker threads while the device scores video k (the north-star
    # overlap, SURVEY §7 step 4 / hard-part 4)
    from concurrent.futures import ThreadPoolExecutor
    workers = max(1, decode_workers)
    with ThreadPoolExecutor(workers) as pool:
        futures = [pool.submit(decode, it) for it in items[:workers]]
        for k, item in enumerate(items):
            fut = futures.pop(0)
            # keep the decode pipeline fed even when this video fails
            if k + workers < len(items):
                futures.append(pool.submit(decode, items[k + workers]))
            try:
                payload, n_frames = fut.result()
            except Exception as e:
                fail(item, "decode", e)
                continue
            try:
                starts = engine.windows_for_video(n_frames, step=step)
                if device_gather:
                    logits = engine.score_staged(payload, starts,
                                                 stride=stride)
                else:
                    windows = engine.gather_windows(payload, starts,
                                                    stride=stride)
                    logits = engine.score_windows(windows)
                _write_score_json(engine, item, n_frames, starts, logits,
                                  checkpoint, out_dir)
            except Exception as e:
                fail(item, "score", e)
            else:
                finish(item)
    return summary


def _write_score_json(engine, item, total_frames, starts, logits, checkpoint,
                      out_dir) -> None:
    scores: Dict[int, Dict[int, float]] = {
        int(s): {int(c): float(v) for c, v in enumerate(l)}
        for s, l in zip(starts, logits)
    }
    res = dict(video_name=item.video_name,
               model="video_model",
               input_shape=[1, engine.num_segments, 3, engine.image_size,
                            engine.image_size],
               checkpoint=checkpoint,
               total_frames=int(total_frames),
               ground_truth=item.reps,
               action=item.class_,
               scores=scores)
    out_path = os.path.join(out_dir, f"{item.video_name}.score.json")
    _atomic_json_dump(res, out_path)


def eval_dataset(engine: InferenceEngine,
                 action: List[str],
                 split: str,
                 data_root: str,
                 anno_path: Optional[str] = None,
                 model_type: str = "video",
                 output_dir: Optional[str] = None,
                 csv_name: Optional[str] = None,
                 save_video: bool = False,
                 threshold: float = 0.0,
                 grid: bool = False,
                 shard: Tuple[int, int] = (0, 1),
                 counts_out: Optional[str] = None,
                 resume: bool = False,
                 on_error: str = "raise") -> Tuple[float, float]:
    """Per-video counting over a split → helper.eval_count MAE/OBO + CSV.

    Matches reference eval_dataset (:424-512). ``threshold`` flows to the
    image counter with the reference's *documented* below-threshold →
    background semantics (frames whose max softmax score falls below it
    count as background). The reference's own code accepts threshold=0.7
    but never applies it (:197-243), so the DEFAULT here is 0 — a default
    run reproduces the reference's actual counts bit-for-bit; pass e.g.
    0.7 to opt into the documented semantics.

    model_type='similarity' (beyond reference) evaluates the
    training-free periodicity counter — ``engine`` must then be a
    features_only engine (input_rank=4). model_type='motion' evaluates
    the spatial-grid pixel-periodicity counter, which needs no engine at
    all (pass None).

    Pod-scale eval: ``shard=(i, n)`` counts only worker i's disjoint
    slice of the split. eval_count divides by the FULL split size either
    way, so the returned (mae, obo) are additive partials — the global
    metrics are the sums over shards, or pass each worker a
    ``counts_out`` JSON path and merge exactly with
    ``eval_count_shards``.

    Fault tolerance (mirrors inference_dataset): ``on_error='skip'``
    records an uncountable video in a per-shard failure manifest next to
    ``counts_out`` (or in ``output_dir``) and keeps sweeping — the video
    is simply absent from ``pred_dict``, and eval_count's
    divide-by-full-split denominator makes the partial metrics honest
    lower bounds. ``resume=True`` (requires ``counts_out``) reloads an
    existing counts JSON and skips its videos; counts flush atomically
    after every video, so a kill -9'd shard rerun completes exactly the
    remaining work and merges bit-identically to an uninterrupted run.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip': {on_error!r}")
    if resume and counts_out is None:
        raise ValueError("resume=True needs counts_out (the file that "
                         "carries the finished counts across restarts)")
    if anno_path is None:
        anno_path = os.path.join(data_root, "annotation.csv")
    if model_type not in ("video", "image", "similarity", "motion", "repnet"):
        raise ValueError(f"Invalid model type: {model_type}")
    helper = RepcountHelper(data_root, anno_path)
    items = helper.get_rep_data(split=[split], action=action)
    if output_dir is not None:
        # before the loop: cv2.VideoWriter silently drops every frame
        # when the directory doesn't exist, so save_video into a fresh
        # output_dir would write nothing without this
        os.makedirs(output_dir, exist_ok=True)
    fail_dir = osp.dirname(osp.abspath(counts_out)) if counts_out \
        else (output_dir or ".")
    failures = _SweepFailures(_failures_path(fail_dir, shard))
    pred_dict: Dict[str, int] = {}
    if resume and osp.isfile(counts_out):
        try:
            with open(counts_out) as f:
                pred_dict = {k: int(v) for k, v in json.load(f).items()}
        except (json.JSONDecodeError, OSError):
            pred_dict = {}
    for item in _shard_items(list(items.values()), shard):
        name = item.video_name
        if resume and name in pred_dict:
            continue
        out_path = None
        if save_video and output_dir is not None:
            out_path = os.path.join(output_dir, name)
        try:
            if model_type == "motion":
                count, _, _ = count_by_motion_periodicity(item.video_path)
            elif model_type == "repnet":
                count, _, _ = count_by_repnet(engine, item.video_path,
                                              grid=grid)
            elif model_type == "similarity":
                count, _, _ = count_by_similarity(engine, item.video_path)
            elif model_type == "video":
                count, _ = count_by_video_model(engine, item.video_path,
                                                ground_truth=item.reps,
                                                video_out_path=out_path)
            else:
                # threshold flows to the image counter only, matching the
                # reference call shape (inference_count.py:488-493)
                count, _ = count_by_image_model(engine, item.video_path,
                                                ground_truth=item.reps,
                                                video_out_path=out_path,
                                                threshold=threshold)
        except Exception as e:
            if on_error == "raise":
                raise
            failures.record(name, "count", e)
            continue
        pred_dict[name] = count
        failures.clear(name)
        if counts_out is not None:
            # incremental + atomic: the finished counts survive a kill -9
            _atomic_json_dump(pred_dict, counts_out)
    if counts_out is not None:
        _atomic_json_dump(pred_dict, counts_out)
    mae, obo_acc, eval_res = helper.eval_count(pred_dict, action=action,
                                               split=[split])
    if output_dir is not None:
        import pandas as pd
        rows = []
        for item in eval_res.values():
            d = dict(item.__dict__)
            d.pop("video_path", None)
            d.pop("frames_path", None)
            rows.append(d)
        if csv_name is None:
            tag = f"_shard{shard[0]}of{shard[1]}" if shard[1] > 1 else ""
            csv_name = f"eval_count_{model_type}_model{tag}.csv"
        if os.path.isfile(os.path.join(output_dir, csv_name)):
            csv_name = csv_name.split(".")[0] + "_" + str(time.time()) + ".csv"
        os.makedirs(output_dir, exist_ok=True)
        pd.DataFrame(rows).to_csv(os.path.join(output_dir, csv_name))
    return mae, obo_acc


def eval_count_shards(counts_files: Sequence[str],
                      data_root: str,
                      anno_path: Optional[str] = None,
                      action: Sequence[str] = ("all",),
                      split: Sequence[str] = ("test",)
                      ) -> Tuple[float, float, Dict]:
    """Exact global MAE/OBO from per-shard count JSONs.

    Each pod worker runs ``eval_dataset(..., shard=(i, n),
    counts_out=f"counts_{i}.json")``; this merges the disjoint dicts and
    runs RepcountHelper.eval_count once over the union — bit-identical
    to a single-process eval of the whole split.
    """
    merged: Dict[str, int] = {}
    for p in counts_files:
        with open(p) as f:
            d = json.load(f)
        overlap = merged.keys() & d.keys()
        if overlap:
            raise ValueError(
                f"shards overlap on {sorted(overlap)[:3]} — did two workers "
                "run with the same shard index?")
        merged.update(d)
    if anno_path is None:
        anno_path = os.path.join(data_root, "annotation.csv")
    helper = RepcountHelper(data_root, anno_path)
    return helper.eval_count(merged, action=list(action), split=list(split))


def main(argv: Optional[List[str]] = None) -> None:
    """Dataset-level scoring/eval CLI (reference utils/inference_count.py
    parse_args+main, :515-595) with pod-scale sharding.

    Modes:
      --score OUT_DIR   score a split → per-video .score.json
                        (inference_dataset)
      --eval            count + MAE/OBO over a split (eval_dataset);
                        prints one JSON line
      --merge-shards F1 F2 ...  merge per-shard counts JSONs →
                        exact global metrics (no engine/device needed)
    Worker i of an n-host pod passes --shard i/n to either mode.
    """
    import argparse

    from workoutdetector_tpu.config import load_config

    parser = argparse.ArgumentParser(
        description="Dataset scoring / rep-count evaluation")
    parser.add_argument("-ckpt", "--checkpoint", default=None,
                        help="orbax checkpoint dir or .jaxm artifact")
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--model-type", default="video",
                        choices=["video", "image", "similarity", "motion",
                                 "repnet"])
    parser.add_argument("--action", default="all")
    parser.add_argument("--split", default="test")
    parser.add_argument("--data-root", default=None)
    parser.add_argument("--anno", default=None)
    parser.add_argument("--score", default=None, metavar="OUT_DIR",
                        help="write .score.json per video into OUT_DIR")
    parser.add_argument("--eval", action="store_true",
                        help="count per video and print MAE/OBO")
    parser.add_argument("--threshold", type=float, default=0.0)
    parser.add_argument("-o", "--output-dir", default=None,
                        help="eval: per-video CSV (and annotated videos "
                             "with --save-video)")
    parser.add_argument("--save-video", action="store_true")
    parser.add_argument("--grid", action="store_true",
                        help="repnet: also score quadrant crops")
    parser.add_argument("--shard", default="0/1", metavar="I/N",
                        help="this worker's slice of the split")
    parser.add_argument("--counts-out", default=None,
                        help="eval: write this shard's counts JSON here")
    parser.add_argument("--merge-shards", nargs="+", default=None,
                        metavar="JSON",
                        help="merge counts JSONs → global metrics")
    parser.add_argument("--chunk-frames", type=int, default=None,
                        help="bound decode memory: stream each video in "
                             "chunks of this many frames (bit-identical "
                             "scores; use for long videos / dataset sweeps)")
    parser.add_argument("--skip-existing", action="store_true",
                        help="score: resume a preempted shard — skip "
                             "videos whose .score.json already parses")
    parser.add_argument("--resume", action="store_true",
                        help="eval: reload --counts-out and skip its "
                             "videos (counts flush after every video, so "
                             "a killed shard rerun finishes the rest)")
    parser.add_argument("--on-error", default="skip",
                        choices=["skip", "raise"],
                        help="per-video failure policy: 'skip' (default "
                             "for the CLI — a corrupt mp4 is logged to "
                             "the shard's failures manifest and the "
                             "sweep continues) or 'raise' (fail fast)")
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU backend")
    parser.add_argument("opts", nargs="*", help="dotted config overrides")
    args = parser.parse_args(argv)

    try:
        i, n = map(int, args.shard.split("/"))
    except ValueError:
        parser.error(f"--shard must be I/N, got {args.shard!r}")
    if n < 1 or not 0 <= i < n:
        parser.error(f"--shard needs 0 <= I < N, got {args.shard!r}")
    if args.score is not None and args.model_type != "video":
        parser.error("--score writes windowed class-score JSONs and only "
                     "works with --model-type video (the reference's "
                     "inference_dataset is the video scorer); counting-only "
                     "model types go through --eval")
    data_root = args.data_root or osp.expanduser("~/data/RepCount/")
    anno_path = args.anno or osp.join(data_root, "annotation.csv")

    if args.merge_shards:
        mae, obo, res = eval_count_shards(args.merge_shards, data_root,
                                          anno_path,
                                          action=[args.action],
                                          split=[args.split])
        print(json.dumps({"mae": mae, "obo_acc": obo, "n_pred": len(res)}))
        return

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    cfg = load_config(args.cfg, args.opts)
    engine = None
    if args.model_type == "similarity":
        # training-free: per-frame features from a bare (headless) ResNet
        # — checkpoint-free by design, exactly the engines the similarity
        # tests build (resnetN(num_classes=0), input_rank=4)
        import jax
        import jax.numpy as jnp

        from workoutdetector_tpu.models import resnet as rn
        ctor = getattr(rn, cfg.model.base_model, None) or rn.resnet18
        net = ctor(num_classes=0, dtype=jnp.float32)
        s = cfg.data.image_size
        variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3)))
        engine = InferenceEngine(net, variables, input_rank=4,
                                 window_batch=16, image_size=s)
    elif args.model_type != "motion":
        from workoutdetector_tpu.infer.engine import engine_from_checkpoint
        if args.model_type == "repnet":
            cfg.model.model_type = "repnet"
        elif args.model_type == "image":
            # per-frame image state classifier (rank-4 engine)
            cfg.model.model_type = "image"
        engine = engine_from_checkpoint(
            cfg, args.checkpoint,
            image_size=cfg.data.image_size,
            input_rank=4 if args.model_type == "image" else None)

    if args.score is not None:
        summary = inference_dataset(
            engine, [args.split], args.score,
            checkpoint=args.checkpoint or "none",
            data_root=data_root, anno_path=anno_path,
            shard=(i, n), chunk_frames=args.chunk_frames,
            skip_existing=args.skip_existing, on_error=args.on_error)
        print(json.dumps({"scored": len(summary["scored"]),
                          "skipped": len(summary["skipped"]),
                          "failed": sorted(summary["failed"]),
                          "shard": [i, n]}))
        return
    if not args.eval:
        parser.error("pass --score OUT_DIR, --eval, or --merge-shards")
    if args.resume and args.counts_out is None:
        parser.error("--resume needs --counts-out")
    mae, obo = eval_dataset(engine, action=[args.action], split=args.split,
                            data_root=data_root, anno_path=anno_path,
                            model_type=args.model_type,
                            output_dir=args.output_dir,
                            save_video=args.save_video,
                            threshold=args.threshold,
                            grid=args.grid,
                            shard=(i, n), counts_out=args.counts_out,
                            resume=args.resume, on_error=args.on_error)
    print(json.dumps({"mae": mae, "obo_acc": obo, "shard": [i, n]}))


if __name__ == "__main__":
    main()
