"""Capture a jax.profiler trace of one model step and print the top device ops.

Perf-engineering companion to tools/model_bench.py (same model builders and
lazy-backend timing discipline): runs N steps inside a profiler trace with
the perfetto JSON export enabled, then aggregates device-track event
durations by op name so a PERF.md entry can say exactly where a step's
milliseconds go without a TensorBoard/XProf UI (none in this image).

Usage:
  python tools/trace_top.py --model timesformer --batch 8 [--train] [--cpu]
                            [--top 30] [--keep /tmp/trace_dir]

The aggregation groups XLA fusion names by their leading op kind (e.g.
``fusion``, ``copy``, ``convolution``) AND prints the top individual names,
because on TPU the interesting story is usually 3-4 big fused loops.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(args) -> str:
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from workoutdetector_tpu.config import ModelConfig
    from workoutdetector_tpu.models.factory import build_model, example_input
    from workoutdetector_tpu.ops.preprocess import normalize_clip

    cfg = ModelConfig()
    cfg.model_type = args.model
    cfg.dropout = 0.0
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
    x0 = example_input(cfg, batch=args.batch)
    variables = model.init({"params": rng}, x0, train=False)
    if args.fold:
        from workoutdetector_tpu.models.timesformer import fold_for_inference
        assert not args.train, "--fold is inference-only"
        model, variables = fold_for_inference(model, dict(variables))
    params = variables["params"]
    batch_stats = dict(variables.get("batch_stats", {}))
    x_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, x0.shape, dtype=np.uint8))

    if args.train:
        import optax
        tx = optax.sgd(0.0)
        opt_state = tx.init(params)
        y = jnp.zeros((args.batch,), jnp.int32)

        def step(params, batch_stats, opt_state, x_u8, y):
            x = normalize_clip(x_u8)

            def loss_fn(p):
                out, upd = model.apply(
                    {"params": p, "batch_stats": batch_stats}, x, train=True,
                    mutable=["batch_stats", "intermediates"],
                    rngs={"dropout": jax.random.PRNGKey(1)})
                logp = jax.nn.log_softmax(out)
                loss = -jnp.mean(logp[jnp.arange(out.shape[0]), y])
                return loss, upd.get("batch_stats", batch_stats)

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss

        fn = jax.jit(step, donate_argnums=(0, 1, 2))

        def run_n(n, base=0):  # base unused: params change every step,
            nonlocal params, batch_stats, opt_state  # so no dedup hazard
            loss = None
            for _ in range(n):
                params, batch_stats, opt_state, loss = fn(
                    params, batch_stats, opt_state, x_u8, y)
            np.asarray(loss)  # force evaluation (lazy backend)
    else:
        def run(params, batch_stats, x_u8, bump):
            x = normalize_clip(x_u8 + (bump % 256).astype(jnp.uint8))
            return model.apply({"params": params, "batch_stats": batch_stats},
                               x, train=False)

        fn = jax.jit(run)

        def run_n(n, base=0):
            # distinct bump per call ACROSS runs: the lazy tunneled
            # backend dedupes identical (fn, args) enqueues, so reusing
            # warm-up bumps would time cached steps (see model_bench)
            outs = [fn(params, batch_stats, x_u8, jnp.int32(base + i))
                    for i in range(n)]
            np.asarray(jnp.stack([o.sum() for o in outs]))

    run_n(max(3, min(args.steps, 20)), 0)  # compile + connection warm-up
    t0 = time.perf_counter()
    run_n(args.steps, 1000)
    wall = (time.perf_counter() - t0) / args.steps
    print(f"steady-state: {wall * 1e3:.2f} ms/step "
          f"({args.batch / wall:.1f} clips/s)", file=sys.stderr)

    outdir = args.keep or tempfile.mkdtemp(prefix="wd_trace_")
    jax.profiler.start_trace(outdir, create_perfetto_trace=True)
    run_n(args.steps, 5000)
    jax.profiler.stop_trace()
    return outdir


def analyze(outdir: str, top: int, steps: int) -> None:
    paths = sorted(glob.glob(
        os.path.join(outdir, "**", "*.json.gz"), recursive=True))
    if not paths:
        print(f"no perfetto trace found under {outdir}", file=sys.stderr)
        sys.exit(2)
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace

    # name the process/thread tracks
    procs, threads = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            procs[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    device_pids = {pid for pid, name in procs.items()
                   if "TPU" in name or "/device:" in name.upper()
                   or "XLA" in name.upper()}
    if not device_pids:  # fall back: anything that isn't plainly host python
        device_pids = {pid for pid, name in procs.items()
                       if "python" not in name.lower()}

    by_name = collections.Counter()
    by_kind = collections.Counter()
    total = 0.0
    tracks = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = threads.get((e["pid"], e.get("tid")), "")
        # only XLA-op rows; skip step/framework annotation tracks
        if tname and ("step" in tname.lower() or "framework" in tname.lower()):
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        # host-side annotations that leak into XLA-labelled CPU tracks
        if name.startswith("$") or "Executor" in name or "asarray" in name:
            continue
        by_name[name] += dur
        kind = name.split(".")[0].split("(")[0]
        # strip trailing digits: fusion.123 / copy.4 -> fusion / copy
        kind = kind.rstrip("0123456789").rstrip("._-") or name
        by_kind[kind] += dur
        total += dur
        tracks[f"{procs.get(e['pid'],'')}/{tname}"] += dur

    print(f"\ntrace: {paths[-1]}")
    print(f"device tracks seen: "
          f"{[t for t, _ in tracks.most_common(6)]}")
    print(f"total device op time: {total / 1e3:.2f} ms over {steps} steps "
          f"= {total / 1e3 / steps:.2f} ms/step\n")
    print(f"{'BY KIND':<28}{'ms/step':>10}{'%':>7}")
    for kind, dur in by_kind.most_common(top):
        print(f"{kind:<28}{dur / 1e3 / steps:>10.3f}{100 * dur / total:>6.1f}%")
    print(f"\n{'TOP INDIVIDUAL OPS':<44}{'ms/step':>10}{'%':>7}")
    for name, dur in by_name.most_common(top):
        print(f"{name[:43]:<44}{dur / 1e3 / steps:>10.3f}"
              f"{100 * dur / total:>6.1f}%")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="timesformer",
                   choices=["tsm", "tdn", "tpn", "timesformer"])
    p.add_argument("--base-model", default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--train", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--flash", default=None, choices=["true", "false", "auto"])
    p.add_argument("--fold", action="store_true")
    p.add_argument("--barrier", action="store_true")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--keep", default=None,
                   help="keep the trace dir at this path (default: tmp)")
    p.add_argument("--analyze-only", default=None,
                   help="skip capture; analyze this existing trace dir")
    args = p.parse_args()

    if args.analyze_only:
        analyze(args.analyze_only, args.top, args.steps)
        return
    outdir = capture(args)
    try:
        analyze(outdir, args.top, args.steps)
    finally:
        if not args.keep:
            shutil.rmtree(outdir, ignore_errors=True)


if __name__ == "__main__":
    main()
