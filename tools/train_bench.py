"""Training-throughput measurement (companion to bench.py's inference
number): TSM-R50 train step clips/sec on the current devices, including
uint8 host→device transfer each step.

    python tools/train_bench.py [--batch 32] [--steps 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--resident", action="store_true",
                        help="reuse a device-resident batch (excludes H2D; "
                        "isolates compute from interconnect transfer)")
    parser.add_argument("--device-augment", action="store_true",
                        help="feed scale_size uint8 canvases and run "
                        "MultiScaleCrop+flip inside the step (ops/augment.py)")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from workoutdetector_tpu.config import Config
    from workoutdetector_tpu.parallel.mesh import shard_batch
    from workoutdetector_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.model_type = "tsm"
    cfg.model.base_model = "resnet50"
    cfg.model.num_class = 12
    cfg.model.num_segments = 8
    cfg.model.dtype = "bfloat16"
    cfg.model.remat = args.remat
    cfg.data.image_size = 224
    cfg.data.device_augment = args.device_augment

    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=100, image_size=224)
    step = trainer.train_step_fn()
    rng = np.random.default_rng(0)
    in_size = cfg.data.scale_size if args.device_augment else 224
    x = rng.integers(0, 256, (args.batch, 8, in_size, in_size, 3),
                     dtype=np.uint8)
    y = rng.integers(0, 12, (args.batch,)).astype(np.int32)

    # sync by HOST FETCH, not block_until_ready: the tunneled 'axon'
    # backend is lazy (block_until_ready no-ops) — see bench.py
    # TIMING NOTE / CLAUDE.md. The loss is a scalar reduction over the
    # step's outputs, so fetching it forces the chained steps.
    bx, by = shard_batch((x, y), trainer.mesh)
    state, m = step(state, bx, by)  # compile
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        if not args.resident:
            bx, by = shard_batch((x, y), trainer.mesh)  # include H2D
        state, m = step(state, bx, by)
    np.asarray(m["loss"])
    dt = time.perf_counter() - t0
    print(f"train: {args.batch * args.steps / dt:.1f} clips/s "
          f"({dt / args.steps * 1e3:.1f} ms/step, remat={args.remat}, "
          f"resident={args.resident}, device_augment={args.device_augment})")


if __name__ == "__main__":
    main()
