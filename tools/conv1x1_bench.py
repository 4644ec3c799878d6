"""Per-kernel timings for the conv-backward probe (VERDICT r4 #2).

Times the two backward contractions of every TSM-R50 bottleneck 1×1
site (batch 32 × T8 deployment shapes) three ways each:

    dx = g @ Wᵀ   — Pallas kernel vs the jitted XLA matmul
    dW = xᵀ @ g   — Pallas row-chunk reduction vs the jitted XLA matmul

using the lazy-backend timing recipe (fetch a checksum over every
output element; see bench.py TIMING NOTE). The e2e A/B lives in
tools/train_bench.py --pallas-conv-bwd; this tool attributes whatever
that measures to individual kernels, per shape.

    python tools/conv1x1_bench.py [--steps 30] [--dtype bfloat16] [--cpu]

Prints one JSON line per (site, op, impl) plus a summary row.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (label, rows, C, O): every distinct bottleneck 1×1 shape of TSM-R50 at
# batch 32 × 8 frames (N = 256 images). conv1 contracts O→C downward,
# conv3 C→O upward; rows = N·H·W at that stage.
SITES = [
    ("s1.conv1", 256 * 56 * 56, 256, 64),
    ("s1.conv3", 256 * 56 * 56, 64, 256),
    ("s2.conv1", 256 * 28 * 28, 512, 128),
    ("s2.conv3", 256 * 28 * 28, 128, 512),
    ("s3.conv1", 256 * 14 * 14, 1024, 256),
    ("s3.conv3", 256 * 14 * 14, 256, 1024),
    ("s4.conv1", 256 * 7 * 7, 2048, 512),
    ("s4.conv3", 256 * 7 * 7, 512, 2048),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--sites", default=None,
                   help="comma list of site labels (default: all)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from workoutdetector_tpu.ops.pallas.conv1x1 import (_dw_pallas,
                                                        _dx_pallas,
                                                        _round_rows)

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    interp = args.cpu

    def timed(fn, arrs, label):
        out = fn(*arrs)  # compile
        np.asarray(out.sum(dtype=jnp.float32))  # force (lazy backend)
        t0 = time.perf_counter()
        acc = []
        for i in range(args.steps):
            acc.append(fn(*arrs).sum(dtype=jnp.float32) + i)
        np.asarray(jnp.stack(acc))  # checksum over EVERY element
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        return round(ms, 3)

    rng = np.random.default_rng(0)
    rows_out = []
    wanted = set(args.sites.split(",")) if args.sites else None
    for label, r, c, o in SITES:
        if wanted and label not in wanted:
            continue
        x = jnp.asarray(rng.normal(size=(r, c)).astype(np.float32)).astype(dt)
        g = jnp.asarray(rng.normal(size=(r, o)).astype(np.float32)).astype(dt)
        wt = jnp.asarray(rng.normal(size=(o, c)).astype(np.float32)).astype(dt)
        tile = _round_rows(r, c, o, dt)

        xla_dx = jax.jit(lambda gg, ww: gg @ ww)
        xla_dw = jax.jit(lambda xx, gg: jax.lax.dot_general(
            xx, gg, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        pal_dx = jax.jit(lambda gg, ww: _dx_pallas(gg, ww, tile, interp))
        pal_dw = jax.jit(lambda xx, gg: _dw_pallas(xx, gg, tile, interp))

        flops_dx = 2 * r * c * o
        flops_dw = 2 * r * c * o
        row = {"site": label, "rows": r, "C": c, "O": o, "tile": tile}
        for op_name, fl, pairs in (
                ("dx", flops_dx, ((xla_dx, (g, wt), "xla"),
                                  (pal_dx, (g, wt), "pallas"))),
                ("dw", flops_dw, ((xla_dw, (x, g), "xla"),
                                  (pal_dw, (x, g), "pallas")))):
            for fn, arrs, impl in pairs:
                ms = timed(fn, arrs, f"{label}.{op_name}.{impl}")
                row[f"{op_name}_{impl}_ms"] = ms
                row[f"{op_name}_{impl}_tflops"] = round(fl / ms / 1e9, 2)
        row["dx_speedup"] = round(row["dx_xla_ms"] / row["dx_pallas_ms"], 3)
        row["dw_speedup"] = round(row["dw_xla_ms"] / row["dw_pallas_ms"], 3)
        print(json.dumps(row), flush=True)
        rows_out.append(row)

    tot_x = sum(r["dx_xla_ms"] + r["dw_xla_ms"] for r in rows_out)
    tot_p = sum(r["dx_pallas_ms"] + r["dw_pallas_ms"] for r in rows_out)
    print(json.dumps({
        "summary": "all-1x1-bwd-sites",
        "dtype": args.dtype,
        "xla_total_ms": round(tot_x, 2),
        "pallas_total_ms": round(tot_p, 2),
        "speedup": round(tot_x / tot_p, 3) if tot_p else None,
    }))


if __name__ == "__main__":
    main()
