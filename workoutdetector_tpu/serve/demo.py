"""Interactive demo: repetition counting + action recognition on uploaded
videos.

Capability match of the reference Gradio demo (workoutdetector/demo.py:
82-284: tasks 'repetition count' via count_by_video_model and 'action
recognition' via one sampled window). gradio is not in this image, so the
UI is gated: with gradio installed the same interface comes up; without
it, a CLI produces the same outputs (annotated video + JSON scores).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Tuple

from workoutdetector_tpu.data.sampling import sample_frames
from workoutdetector_tpu.data.video import VideoReader
from workoutdetector_tpu.infer.engine import InferenceEngine
from workoutdetector_tpu.infer.inference_count import (count_by_video_model,
                                                       write_count_video)
from workoutdetector_tpu.serve.server import scores_to_payload
from workoutdetector_tpu.settings import WORKOUT_LABELS


def inference_video_action(engine: InferenceEngine, video_path: str,
                           labels: List[str]) -> Dict[str, float]:
    """Action recognition: decode all → uniform 8-frame sample → one
    window score (reference demo.py:161-195)."""
    with VideoReader(video_path) as r:
        clip = r.read_prepped(256, engine.image_size)
    if len(clip) == 0:
        raise IOError(f"no decodable frames in {video_path}")
    idx = sample_frames(len(clip), engine.num_segments, random=False)
    scores = engine.score_windows(clip[idx][None])[0]
    return scores_to_payload(scores, labels)


def inference_video_reps(engine: InferenceEngine, video_path: str,
                         output_path: Optional[str] = None
                         ) -> Tuple[int, List[int]]:
    """Repetition counting task (reference demo.py:198-249)."""
    count, reps = count_by_video_model(engine, video_path,
                                       video_out_path=output_path)
    return count, reps


def run_demo(engine_action: InferenceEngine,
             engine_reps: InferenceEngine,
             labels: Optional[List[str]] = None) -> None:
    """Launch the Gradio interface if available (reference demo.py:260-284)."""
    labels = labels or list(WORKOUT_LABELS)
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed in this image; use the CLI: "
            "python -m workoutdetector_tpu.serve.demo -i video.mp4 "
            "--task count|recognize") from e

    def main(video, task):
        if task == "repetition count":
            out = video + ".annotated.webm"
            count, reps = inference_video_reps(engine_reps, video, out)
            return {f"count: {count}": 1.0}, out
        scores = inference_video_action(engine_action, video, labels)
        return scores, None

    gr.Interface(
        fn=main,
        inputs=[gr.Video(), gr.Radio(["repetition count", "action recognition"])],
        outputs=[gr.Label(num_top_classes=5), gr.Video()],
        title="Workout Detector (TPU)",
    ).launch()


def main() -> None:
    import argparse

    import jax

    from workoutdetector_tpu.config import load_config

    parser = argparse.ArgumentParser(description="Workout demo (CLI fallback)")
    parser.add_argument("-i", "--video", required=True)
    parser.add_argument("--task",
                        choices=["count", "recognize", "count-similarity",
                                 "count-repnet"],
                        default="count",
                        help="count-similarity: training-free periodicity "
                             "counter (no checkpoint needed); count-repnet: "
                             "learnable period counter (models/repnet.py, "
                             "--cfg configs/repnet.yaml --checkpoint ...)")
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--checkpoint", default=None,
                        help="orbax checkpoint dir or .jaxm artifact "
                             "(reference demo loads .onnx, demo.py:62-72)")
    parser.add_argument("-o", "--output", default=None,
                        help="annotated video output path")
    parser.add_argument("--grid", action="store_true",
                        help="count-repnet: also score quadrant crops "
                             "(localized-motion remedy)")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("opts", nargs="*", help="dotted config overrides")
    args = parser.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cfg = load_config(args.cfg, args.opts)
    if args.task == "count-similarity":
        # no checkpoint required: per-cell pixel periodicity (the
        # strongest training-free counter — raw MAE 0.5 on the
        # reference's real example videos; infer.count_by_motion_
        # periodicity). The global CNN-feature variant remains available
        # as infer.count_by_similarity.
        from workoutdetector_tpu.infer import count_by_motion_periodicity
        count, period, strength = count_by_motion_periodicity(args.video)
        print(json.dumps({"count": count, "period_frames": period,
                          "strength": round(float(strength), 4)}))
        return
    if args.task == "recognize":
        cfg.model.num_class = len(WORKOUT_LABELS)
    def build_engine(image_size=None, window_batch=None):
        """One engine-loading path for every task: .jaxm artifact or
        fresh init + optional orbax restore (shared with the dataset
        CLI, infer.engine.engine_from_checkpoint)."""
        from workoutdetector_tpu.infer.engine import engine_from_checkpoint
        return engine_from_checkpoint(cfg, args.checkpoint,
                                      image_size=image_size,
                                      window_batch=window_batch)

    if args.task == "count-repnet":
        cfg.model.model_type = "repnet"
        from workoutdetector_tpu.infer import count_by_repnet
        engine = build_engine(image_size=cfg.data.image_size,
                              window_batch=4)
        count, period, strength = count_by_repnet(engine, args.video,
                                                  grid=args.grid)
        print(json.dumps({"count": count, "period_frames": period,
                          "strength": round(float(strength), 4)}))
        return
    engine = build_engine()
    if args.task == "count":
        count, reps = inference_video_reps(engine, args.video, args.output)
        print(json.dumps({"count": count, "reps": reps}))
    else:
        scores = inference_video_action(engine, args.video, list(WORKOUT_LABELS))
        print(json.dumps(scores))


if __name__ == "__main__":
    main()
