"""Counting-path gather A/B: count_by_video_model's dense windows through
the fused device gather vs the host copy loop (docs/PERF.md round-3
"Dense-counter gather A/B" — device is the shipped default; the host
loop remains the .jaxm-artifact fallback).

    python tools/count_bench.py [--cpu] [--frames 336] [--image-size 224]
        [--batch 32] [--reps 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--frames", type=int, default=336)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--base-model", default="resnet50")
    p.add_argument("--batch", type=int, default=32,
                   help="engine window_batch")
    p.add_argument("--reps", type=int, default=8)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from workoutdetector_tpu.infer import InferenceEngine
    from workoutdetector_tpu.models import TSM

    size = args.image_size
    model = TSM(num_class=12, num_segments=8, base_model=args.base_model,
                dropout=0.0, dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 8, size, size, 3), jnp.float32),
                           train=False)
    rng = np.random.default_rng(0)
    video = rng.integers(0, 256, (args.frames, size, size, 3), dtype=np.uint8)
    starts = np.arange(0, (len(video) // 8) * 8, 8)

    for gather in ("device", "host"):
        eng = InferenceEngine(model, dict(variables), num_segments=8,
                              window_batch=args.batch, image_size=size,
                              gather=gather)
        # warm: compile + one full-length pass (lazy-backend recipe —
        # the |logits| sum fetch forces every element, see bench.py)
        _, logits = eng.score_video(video, stride=1, starts=starts)
        float(np.abs(logits).sum())
        t0 = time.perf_counter()
        for _ in range(args.reps):
            _, logits = eng.score_video(video, stride=1, starts=starts)
            float(np.abs(logits).sum())
        dt = (time.perf_counter() - t0) / args.reps
        print(json.dumps({"gather": gather,
                          "ms_per_video": round(dt * 1e3, 1),
                          "windows": int(len(starts)),
                          "windows_per_sec": round(len(starts) / dt, 1)}))


if __name__ == "__main__":
    main()
