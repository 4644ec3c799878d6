"""Per-model TPU throughput bench: device-resident inference + train step.

Generalizes bench.py's methodology (3 warmup steps, steady-state mean,
device-resident uint8 inputs with the normalize fused into the graph) to
every model family, and reports achieved FLOP/s from XLA's own cost
analysis of the compiled executable — so MFU numbers in docs/PERF.md come
from the compiler's FLOP count, not hand math.

Usage:
  python tools/model_bench.py --model timesformer --batch 8 [--train] [--cpu]

_TIMING_NOTE: the tunneled 'axon' backend is fully lazy —
``block_until_ready()`` is a no-op (measured: a 4.4-TFLOP matmul chain
"completes" in 0.03 ms) and only a host fetch (``np.asarray``) forces
evaluation. Moreover the lazy graph dead-code-eliminates anything the
fetched value doesn't depend on: fetching one element of the logits
skips the other batch rows entirely (measured: impossible >2500 clips/s
vs the known ~26 ms device floor). Timing therefore (a) syncs by
fetching a checksum (sum) over EVERY output element, and (b) warms up
with a full-length step batch (the first enqueued batch after compile
carries ~1.5x connection warm-up) then times one long run — per-step
cost is flat (±2%) for n in [40, 200]. On a non-lazy backend both
choices are harmless.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flop_analysis(fn, *args):
    """XLA HLO cost analysis of fn at these shapes. The tunneled 'axon'
    backend's Lowered.cost_analysis() returns None (analysis lives
    server-side), so lower against the always-present CPU backend — the
    client-side HLO FLOP count is backend-independent."""
    import jax
    try:
        cost = jax.jit(fn, device=jax.devices("cpu")[0]).lower(
            *args).cost_analysis()
    except Exception:
        return None
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return cost


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="timesformer",
                   choices=["tsm", "tdn", "tpn", "timesformer", "repnet"])
    p.add_argument("--base-model", default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--image-size", type=int, default=224,
                   help="repnet ships at 64 (configs/repnet.yaml)")
    p.add_argument("--segments", type=int, default=None,
                   help="override cfg.num_segments (repnet ships at 64)")
    p.add_argument("--num-class", type=int, default=None,
                   help="override cfg.num_class (e.g. 400 to quantify "
                        "the Kinetics-400 head cost vs the 12-class "
                        "RepCount head)")
    p.add_argument("--steps", type=int, default=80,
                   help="large default: dispatch overhead on the lazy "
                        "tunneled backend only amortizes past ~40 steps")
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--train", action="store_true",
                   help="bench the fwd+bwd+update step instead of inference")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--flash", default=None, choices=["true", "false", "auto"],
                   help="TimeSformer: cfg.model.flash_attention override")
    p.add_argument("--fold", action="store_true",
                   help="TimeSformer: fold t_fc into t_attn.proj "
                        "(inference only)")
    p.add_argument("--barrier", action="store_true",
                   help="TimeSformer: optimization_barrier between blocks")
    p.add_argument("--sweep", default=None, metavar="B1,B2,...",
                   help="autotune the serving operating point: bench each "
                        "batch size, print one row per size plus a "
                        "'recommended' line (max clips/s, optionally "
                        "latency-bounded)")
    p.add_argument("--latency-ms", type=float, default=None,
                   help="with --sweep: recommend the fastest batch whose "
                        "step time stays under this bound (serving SLO)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from workoutdetector_tpu.config import ModelConfig
    from workoutdetector_tpu.models.factory import build_model, example_input
    from workoutdetector_tpu.ops.preprocess import normalize_clip

    cfg = ModelConfig()
    cfg.model_type = args.model
    cfg.dropout = 0.0
    cfg.image_size = args.image_size
    if args.num_class:
        cfg.num_class = args.num_class
    if args.segments:
        cfg.num_segments = args.segments
    if args.flash:
        cfg.flash_attention = args.flash
    if args.base_model:
        cfg.base_model = args.base_model
    elif args.model == "timesformer":
        cfg.base_model = "vit_base_patch16_224"
    model = build_model(cfg)
    if args.barrier:
        model = model.clone(block_barrier=True)

    rng = jax.random.PRNGKey(0)
    x0 = example_input(cfg, batch=args.batch, image_size=args.image_size)
    variables = model.init({"params": rng}, x0, train=False)
    if args.fold:
        from workoutdetector_tpu.models.timesformer import fold_for_inference
        assert not args.train, "--fold is inference-only"
        model, variables = fold_for_inference(model, dict(variables))
        variables = dict(variables)
    params = variables["params"]
    batch_stats = dict(variables.get("batch_stats", {}))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))

    def bench_batch(batch):
        return _bench_one(args, cfg, model, params, batch_stats, n_params,
                          batch, jax, jnp, np)

    if args.sweep:
        batches = [int(b) for b in args.sweep.split(",")]
        rows = []
        for b in batches:
            row = bench_batch(b)
            rows.append(row)
            print(json.dumps(row))
        ok = [r for r in rows
              if args.latency_ms is None or r["ms_per_step"] <= args.latency_ms]
        pool = ok or rows  # nothing meets the SLO → report fastest anyway
        best = max(pool, key=lambda r: r["clips_per_sec"])
        print(json.dumps({
            "recommended_batch": best["batch"],
            "clips_per_sec": best["clips_per_sec"],
            "ms_per_step": best["ms_per_step"],
            "latency_bound_ms": args.latency_ms,
            "meets_latency_bound": bool(ok) if args.latency_ms else None,
        }))
        return
    print(json.dumps(bench_batch(args.batch)))


def _bench_one(args, cfg, model, params, batch_stats, n_params, batch,
               jax, jnp, np):
    import optax

    from workoutdetector_tpu.models.factory import example_input
    from workoutdetector_tpu.ops.preprocess import normalize_clip

    shape = example_input(cfg, batch=batch,
                          image_size=args.image_size).shape
    x_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, shape, dtype=np.uint8))

    if args.train:
        # donated below — work on copies so a --sweep can re-bench the
        # same weights at the next batch size
        params = jax.tree_util.tree_map(jnp.copy, params)
        batch_stats = jax.tree_util.tree_map(jnp.copy, batch_stats)
        tx = optax.sgd(0.0)  # throughput only; lr 0 keeps weights stable
        opt_state = tx.init(params)
        y = jnp.zeros((batch,), jnp.int32)

        def step(params, batch_stats, opt_state, x_u8, y):
            x = normalize_clip(x_u8)

            def loss_fn(p):
                out, upd = model.apply(
                    {"params": p, "batch_stats": batch_stats}, x, train=True,
                    mutable=["batch_stats", "intermediates"],
                    rngs={"dropout": jax.random.PRNGKey(1)})
                logp = jax.nn.log_softmax(out)
                loss = -jnp.mean(logp[jnp.arange(out.shape[0]), y])
                inter = upd.get("intermediates", {})
                if "aux_logits" in inter:
                    a = inter["aux_logits"][0]
                    ya = y
                    if a.ndim == 3:  # dense (B,T,C) sow: labels over T
                        ya = jnp.repeat(y, a.shape[1])
                        a = a.reshape(-1, a.shape[-1])
                    a = jax.nn.log_softmax(a)
                    loss = loss + 0.5 * -jnp.mean(
                        a[jnp.arange(a.shape[0]), ya])
                return loss, upd.get("batch_stats", batch_stats)

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss

        fn = jax.jit(step, donate_argnums=(0, 1, 2))
        cost = _flop_analysis(step, params, batch_stats, opt_state, x_u8, y)

        def run_n(n):
            nonlocal params, batch_stats, opt_state
            t0 = time.perf_counter()
            for _ in range(n):
                params, batch_stats, opt_state, loss = fn(
                    params, batch_stats, opt_state, x_u8, y)
            np.asarray(loss)  # forced evaluation — see _TIMING_NOTE
            return time.perf_counter() - t0

        run_n(max(args.warmup, min(args.steps, 40)))
        dt = run_n(args.steps) / args.steps
    else:
        # params/batch_stats must be ARGS, not a closure: closed-over
        # arrays are baked into the HLO as constants, and the tunneled
        # compile endpoint rejects >~100 MB requests (HTTP 413) — a ViT-B
        # would ship 484 MB of weights inside the program.
        def run(params, batch_stats, x_u8, bump):
            # bump is an int32 device scalar that perturbs the input per
            # call so no two enqueued steps are identical (fn, args)
            # pairs — int32 so it never wraps within a run (a uint8 bump
            # made steps i and i+256 byte-identical and dedupable)
            x = normalize_clip(x_u8 + (bump % 256).astype(jnp.uint8))
            return model.apply({"params": params, "batch_stats": batch_stats},
                               x, train=False)

        fn = jax.jit(run)
        zero = jnp.zeros((), jnp.int32)
        cost = _flop_analysis(run, params, batch_stats, x_u8, zero)

        def run_n(n, base):
            t0 = time.perf_counter()
            outs = [fn(params, batch_stats, x_u8,
                       jnp.int32(base + i)) for i in range(n)]
            # forced evaluation of EVERY element — see _TIMING_NOTE
            np.asarray(jnp.stack([o.sum() for o in outs]))
            return time.perf_counter() - t0

        run_n(max(args.warmup, min(args.steps, 40)), 0)
        dt = run_n(args.steps, 64) / args.steps

    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    clips_s = batch / dt
    return {
        "model": args.model,
        "base_model": cfg.base_model,
        "mode": "train" if args.train else "inference",
        "num_class": cfg.num_class,
        "batch": batch,
        "params_m": round(n_params / 1e6, 2),
        "ms_per_step": round(dt * 1e3, 2),
        "clips_per_sec": round(clips_s, 1),
        "xla_gflops_per_step": round(flops / 1e9, 1),
        "achieved_tflops": round(flops / dt / 1e12, 1),
    }


if __name__ == "__main__":
    main()
