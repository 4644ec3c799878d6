"""Headline benchmark: TSM-R50 8-frame clip inference throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec", "vs_baseline": N}

The measured path is the production inference graph (BASELINE.json north
star): uint8 windows → fused normalize → TSM-R50 (bf16, NHWC) → logits,
batched ``WINDOW_BATCH`` clips per device step — the pipeline
infer.engine.InferenceEngine replays for every video.

vs_baseline divides by the reference's deployment-style CPU throughput
(onnxruntime is not in this image; the stand-in is a plain torch-CPU
ResNet-50 forward per 8-frame clip — same FLOPs, TSM shift is zero-FLOP).
Measured once via workoutdetector_tpu/scripts/torch_baseline.py on this
image's CPU: 1.323 clips/sec. Override with WD_BENCH_BASELINE or
--measure-baseline.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_BASELINE_CLIPS_PER_SEC = 1.323  # torch-CPU R50, measured 2026-08-16


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32,
                        help="clips per device step")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--measure-baseline", action="store_true")
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU (debug)")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # note: the persistent compilation cache is a no-op for the tunneled
    # 'axon' backend in this image (nothing is written), so it's not enabled
    import jax.numpy as jnp
    import numpy as np

    from workoutdetector_tpu.models import TSM
    from workoutdetector_tpu.ops.preprocess import normalize_clip

    model = TSM(num_class=12, num_segments=8, base_model="resnet50",
                dropout=0.0, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    init_x = jnp.zeros((1, 8, 224, 224, 3), jnp.float32)
    variables = jax.jit(lambda: model.init({"params": rng}, init_x,
                                           train=False))()

    @jax.jit
    def run(x_u8):
        return model.apply(variables, normalize_clip(x_u8), train=False)

    x = np.random.default_rng(0).integers(0, 256,
                                          size=(args.batch, 8, 224, 224, 3),
                                          dtype=np.uint8)
    xd = jax.device_put(jnp.asarray(x))

    for _ in range(args.warmup):
        run(xd).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = run(xd)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    clips_per_sec = args.batch * args.steps / dt

    baseline = float(os.environ.get("WD_BENCH_BASELINE", 0)) or None
    if baseline is None and args.measure_baseline:
        from workoutdetector_tpu.scripts.torch_baseline import measure
        baseline = measure()
    if baseline is None:
        baseline = DEFAULT_BASELINE_CLIPS_PER_SEC

    print(json.dumps({
        "metric": "tsm_r50_8frame_inference_throughput",
        "value": round(clips_per_sec, 2),
        "unit": "clips/sec",
        "vs_baseline": round(clips_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
