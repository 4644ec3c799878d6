"""Training-throughput measurement (companion to bench.py's inference
number): the REAL trainer step (TSN-policy optax update, partial-BN,
grad clip, donated state) on the current devices.

The round-3 lever campaign (VERDICT r2 weak #1) runs through this tool:
every flag below is one measured lever of the train-path MFU table in
docs/PERF.md. Prints ONE JSON line with wall time AND XLA-cost-analysis
FLOPs (the same accounting tools/model_bench.py uses), so MFU is the
compiler's own count, not the fwd≈3×-FLOPs estimate.

    python tools/train_bench.py [--batch 32] [--steps 40] [--resident]
        [--dtype bfloat16|float32] [--remat] [--flat-optimizer]
        [--grad-clip X] [--full-bn] [--device-augment] [--trace DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--steps", type=int, default=40)
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--resident", action="store_true",
                        help="reuse a device-resident batch (excludes H2D; "
                        "isolates compute from interconnect transfer)")
    parser.add_argument("--device-augment", action="store_true",
                        help="feed scale_size uint8 canvases and run "
                        "MultiScaleCrop+flip inside the step (ops/augment.py)")
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32"],
                        help="compute dtype lever (params stay fp32)")
    parser.add_argument("--flat-optimizer", action="store_true",
                        help="flat SGD instead of the reference's 8-group "
                        "TSN-policy multi_transform (update-stage lever)")
    parser.add_argument("--delayed-clip", action="store_true",
                        help="optimizer.grad_clip_delayed: clip by the "
                             "previous step's norm — removes the "
                             "global-norm barrier from the critical path")
    parser.add_argument("--grad-clip", type=float, default=None,
                        help="override optimizer.grad_clip (0 removes the "
                        "global-norm pass; default is the reference's 20)")
    parser.add_argument("--full-bn", action="store_true",
                        help="disable partial-BN (all BN stats update — "
                        "more elementwise traffic in fwd+bwd)")
    parser.add_argument("--ema", action="store_true",
                        help="EMA weight averaging in the step (one tree-fma)")
    parser.add_argument("--watch", type=int, default=0, metavar="N",
                        help="log.watch_every_n_steps: every N steps run "
                        "the watch step variant (per-leaf grad/param norm "
                        "vectors fetched to host) — measures the gradient-"
                        "watch hook's amortized cost")
    parser.add_argument("--trace", default=None, metavar="DIR",
                        help="jax.profiler trace of the timed steps into DIR "
                        "(read with tools/trace_top.py)")
    parser.add_argument("--base-model", default="resnet50")
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--pallas-conv-bwd", action="store_true",
                        help="bottleneck 1×1 convs backward through the "
                        "Pallas matmul kernels (ops/pallas/conv1x1.py) — "
                        "the conv-backward MFU probe, VERDICT r4 #2")
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
    cfg.model.base_model = args.base_model
    cfg.model.num_class = 12
    cfg.model.num_segments = 8
    cfg.model.dtype = args.dtype
    cfg.model.remat = args.remat
    cfg.model.partial_bn = not args.full_bn
    cfg.model.pallas_conv_bwd = args.pallas_conv_bwd
    cfg.data.image_size = args.image_size
    cfg.data.device_augment = args.device_augment
    if args.flat_optimizer:
        cfg.optimizer.use_tsn_policies = False
    if args.grad_clip is not None:
        cfg.optimizer.grad_clip = args.grad_clip
    cfg.optimizer.grad_clip_delayed = args.delayed_clip
    if args.ema:
        cfg.optimizer.ema_decay = 0.999

    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=100, image_size=args.image_size)
    step = trainer.train_step_fn()
    watch_step = trainer.train_step_fn(watch=True) if args.watch else None
    rng = np.random.default_rng(0)
    in_size = cfg.data.scale_size if args.device_augment else args.image_size
    x = rng.integers(0, 256, (args.batch, 8, in_size, in_size, 3),
                     dtype=np.uint8)
    y = rng.integers(0, 12, (args.batch,)).astype(np.int32)

    # sync by HOST FETCH, not block_until_ready: the tunneled 'axon'
    # backend is lazy (block_until_ready no-ops) — see bench.py
    # TIMING NOTE / CLAUDE.md. The loss is a scalar reduction over the
    # step's outputs, so fetching it forces the chained steps.
    bx, by = shard_batch((x, y), trainer.mesh)
    flops = 0.0
    try:
        # pre-compile HLO cost analysis (same accounting as model_bench);
        # NOT .compile().cost_analysis() — that would compile the program
        # a second time outside the jit cache (minutes over the tunnel)
        cost = step.lower(state, bx, by).cost_analysis()
        if isinstance(cost, list):  # older jax returns one dict per device
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        pass  # cost analysis unavailable on this backend — wall time only
    state, m = step(state, bx, by)  # compile
    np.asarray(m["loss"])
    if watch_step is not None:
        state, wm = watch_step(state, bx, by)  # compile the watch variant
        np.asarray(wm["watch_grad_leaf_norms"])
    # first post-compile batch runs ~1.5x slow on the tunnel; warm up
    for _ in range(3):
        state, m = step(state, bx, by)
    np.asarray(m["loss"])
    if args.trace:
        jax.profiler.start_trace(args.trace)
    t0 = time.perf_counter()
    for i in range(args.steps):
        if not args.resident:
            bx, by = shard_batch((x, y), trainer.mesh)  # include H2D
        if watch_step is not None and (i + 1) % args.watch == 0:
            # the fit loop's exact behavior: watch step + ONE host fetch
            # of both norm vectors on the watch step itself
            state, m = watch_step(state, bx, by)
            np.asarray(m["watch_grad_leaf_norms"])
            np.asarray(m["watch_param_leaf_norms"])
        else:
            state, m = step(state, bx, by)
    np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / args.steps
    if args.trace:
        jax.profiler.stop_trace()
    print(json.dumps({
        "mode": "train",
        "batch": args.batch,
        "ms_per_step": round(dt * 1e3, 2),
        "clips_per_sec": round(args.batch / dt, 1),
        "xla_gflops_per_step": round(flops / 1e9, 1),
        "achieved_tflops": round(flops / dt / 1e12, 1),
        "dtype": args.dtype,
        "remat": args.remat,
        "resident": args.resident,
        "device_augment": args.device_augment,
        "flat_optimizer": args.flat_optimizer,
        "grad_clip": args.grad_clip,
        "delayed_clip": args.delayed_clip,
        "full_bn": args.full_bn,
        "ema": args.ema,
        "watch_every": args.watch,
        "pallas_conv_bwd": args.pallas_conv_bwd,
    }))


if __name__ == "__main__":
    main()
