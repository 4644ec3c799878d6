"""Serving benchmark: concurrent webcam-style WS clients against a live
WorkoutServer (the reference app/server.py contract) with the real model
on the device.

Each client streams 8-frame windows of webp data-URLs exactly like the
browser app (100 ms cadence is replaced by as-fast-as-possible to measure
capacity), and waits for the per-window score reply. The shared
AsyncBatcher coalesces concurrent windows into device batches.

Prints ONE JSON line: windows/s, frames/s, per-window latency p50/p95,
and batcher coalescing stats.

Usage:
  python tools/serve_bench.py [--clients 8] [--windows 6] [--cpu]
                              [--base-model resnet50] [--image-size 224]
                              [--mode recognize|periodic]

--mode periodic load-tests the checkpoint-free live counter instead
('mode:count-periodic', infer/streaming.StreamingPeriodicCounter over a
RepNet-small engine): each client streams frames and a status reply
arrives per window hop; latency is measured hop-send → status.

On the tunneled dev chip the per-window latency includes the ~50 ms
fetch round-trip per batch; throughput is therefore a LOWER bound on a
real host's.
"""

import argparse
import asyncio
import base64
import io
import json
import os
import socket
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _frame_data_url(rng, size: int) -> str:
    from PIL import Image
    img = Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype="uint8"),
                          "RGB")
    buf = io.BytesIO()
    img.save(buf, format="WEBP")
    return "data:image/webp;base64," + base64.b64encode(buf.getvalue()).decode()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--windows", type=int, default=6,
                   help="8-frame windows per client")
    p.add_argument("--base-model", default="resnet50")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch-delay-ms", type=float, default=10.0)
    p.add_argument("--mode", choices=["recognize", "periodic"],
                   default="recognize")
    p.add_argument("--open-loop", action="store_true",
                   help="saturation mode (recognize only): clients "
                        "stream frames for --duration seconds WITHOUT "
                        "waiting for replies (webcam semantics, not "
                        "request/response), so offered load can exceed "
                        "capacity and the shed-oldest overload policy "
                        "engages; reports served windows/s, frames shed, "
                        "and freshness percentiles (reply arrival minus "
                        "newest-frame send — how stale a live result is)")
    p.add_argument("--duration", type=float, default=8.0,
                   help="open-loop: seconds of streaming per round")
    p.add_argument("--fps", type=float, default=0.0,
                   help="open-loop: per-client frame cadence "
                        "(0 = as fast as possible)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from workoutdetector_tpu.infer.engine import InferenceEngine
    from workoutdetector_tpu.models import TSM
    from workoutdetector_tpu.serve.server import WorkoutServer

    model = TSM(num_class=11, num_segments=8, base_model=args.base_model,
                dropout=0.0,
                dtype=jnp.float32 if args.cpu else jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    init_x = jnp.zeros((1, 8, args.image_size, args.image_size, 3),
                       jnp.float32)
    variables = jax.jit(lambda: model.init({"params": rng}, init_x,
                                           train=False))()
    engine = InferenceEngine(model, variables, num_segments=8,
                             window_batch=max(args.clients, 4),
                             image_size=args.image_size)
    if args.mode == "recognize":
        # pay the compile before measuring (periodic mode never scores
        # the recognition engine — it compiles lazily, i.e. never)
        engine.score_windows(np.zeros(
            (1, 8, args.image_size, args.image_size, 3), np.uint8))

    periodic_engine = None
    t_win = 16
    if args.mode == "periodic":
        from workoutdetector_tpu.models.repnet import (REPNET_VARIANTS,
                                                       RepNet)
        width, embed, mdim, heads = REPNET_VARIANTS["small"]
        rmodel = RepNet(num_segments=t_win, width=width, embed_dim=embed,
                        model_dim=mdim, num_heads=heads, dropout=0.0,
                        dtype=jnp.float32 if args.cpu else jnp.bfloat16)
        rvars = rmodel.init(
            {"params": rng},
            jnp.zeros((1, t_win, args.image_size, args.image_size, 3),
                      jnp.float32), train=False)
        periodic_engine = InferenceEngine(
            rmodel, rvars, num_segments=t_win,
            window_batch=max(args.clients, 4),
            image_size=args.image_size)

    srv = WorkoutServer(engine, host="127.0.0.1", http_port=_free_port(),
                        ws_port=_free_port(),
                        batch_delay_ms=args.batch_delay_ms,
                        periodic_engine=periodic_engine)

    frames = [_frame_data_url(np.random.default_rng(c), args.image_size)
              for c in range(args.clients)]

    async def one_client(cid):
        import websockets
        uri = f"ws://127.0.0.1:{srv.ws_port}/ws/bench{cid}"
        lat = []
        async with websockets.connect(uri, max_size=None) as ws:
            for _ in range(args.windows):
                t0 = time.perf_counter()
                for _ in range(8):
                    await ws.send(frames[cid])
                reply = json.loads(await asyncio.wait_for(ws.recv(), 120))
                assert reply.get("success"), reply
                lat.append(time.perf_counter() - t0)
            await ws.send("stop")
        return lat

    async def one_client_periodic(cid):
        import websockets
        uri = f"ws://127.0.0.1:{srv.ws_port}/ws/bench{cid}"
        lat, hop = [], t_win // 2
        async with websockets.connect(uri, max_size=None) as ws:
            await ws.send("mode:count-periodic")
            for _ in range(t_win):  # warmup: fill the rolling window
                await ws.send(frames[cid])
            await asyncio.wait_for(ws.recv(), 120)
            for _ in range(args.windows):
                t0 = time.perf_counter()
                for _ in range(hop):
                    await ws.send(frames[cid])
                reply = json.loads(await asyncio.wait_for(ws.recv(), 120))
                assert reply.get("success"), reply
                lat.append(time.perf_counter() - t0)
            await ws.send("stop")
        return lat

    async def one_client_open(cid, stop_at):
        """Stream frames until the deadline without awaiting replies; a
        reader task tallies replies + freshness (reply arrival − newest
        frame send). Overload shows up as server-side shed frames, NOT
        as queue growth or missed replies."""
        import websockets
        uri = f"ws://127.0.0.1:{srv.ws_port}/ws/bench{cid}"
        freshness = []
        last_send = [0.0]
        async with websockets.connect(uri, max_size=None) as ws:
            async def reader():
                try:
                    while True:
                        reply = json.loads(await ws.recv())
                        assert reply.get("success"), reply
                        freshness.append(
                            time.perf_counter() - last_send[0])
                except Exception:
                    pass

            rt = asyncio.create_task(reader())
            sent = 0
            period = 1.0 / args.fps if args.fps > 0 else 0.0
            nxt = time.perf_counter()
            while time.perf_counter() < stop_at:
                last_send[0] = time.perf_counter()
                await ws.send(frames[cid])
                sent += 1
                if period:
                    nxt += period
                    delay = nxt - time.perf_counter()
                    if delay > 0:
                        await asyncio.sleep(delay)
                else:
                    await asyncio.sleep(0)
            # let in-flight scores land before closing: the host decode
            # backlog at saturation can run several seconds deep (one
            # prep worker per core; this box has had nproc=1)
            await asyncio.sleep(5.0)
            rt.cancel()
            await ws.send("stop")
        return sent, freshness

    if args.mode == "periodic":
        one_client = one_client_periodic

    async def drive_open():
        ws_task = asyncio.create_task(srv.serve_ws())
        await asyncio.sleep(0.3)
        # warmup round engages compiles + batcher
        await asyncio.gather(*[one_client_open(
            c, time.perf_counter() + 2.0) for c in range(args.clients)])
        shed0 = srv._frames_shed
        req0, fl0 = srv.batcher.n_requests, srv.batcher.n_flushes
        t0 = time.perf_counter()
        res = await asyncio.gather(*[one_client_open(
            c, t0 + args.duration) for c in range(args.clients)])
        dt = time.perf_counter() - t0
        ws_task.cancel()
        try:
            await ws_task
        except asyncio.CancelledError:
            pass
        return res, dt, srv._frames_shed - shed0, \
            srv.batcher.n_requests - req0, srv.batcher.n_flushes - fl0

    if args.open_loop:
        assert args.mode == "recognize", "--open-loop is recognize-only"
        res, dt, shed, n_req, n_flush = asyncio.run(drive_open())
        sent = sum(s for s, _ in res)
        fresh = sorted(f for _, fs in res for f in fs)
        assert fresh, "no replies received"

        def pct(q):
            return round(1e3 * fresh[int(q * (len(fresh) - 1))], 1)

        print(json.dumps({
            "metric": "serving_ws_saturation",
            "clients": args.clients,
            "duration_s": round(dt, 2),
            "offered_frames_per_sec": round(sent / dt, 1),
            "served_windows_per_sec": round(len(fresh) / dt, 2),
            "served_frames_per_sec": round(8 * len(fresh) / dt, 1),
            "frames_shed": shed,
            "shed_fraction": round(shed / max(sent, 1), 3),
            "freshness_p50_ms": pct(0.50),
            "freshness_p95_ms": pct(0.95),
            "freshness_p99_ms": pct(0.99),
            "batch_coalescing": round(n_req / max(n_flush, 1), 2),
            "backend": "cpu" if args.cpu else "tpu",
        }))
        return

    async def drive():
        ws_task = asyncio.create_task(srv.serve_ws())
        await asyncio.sleep(0.3)
        # warmup round (connection + batcher settle), then measured round
        await asyncio.gather(*[one_client(c) for c in range(args.clients)])
        req0, fl0 = srv.batcher.n_requests, srv.batcher.n_flushes
        t0 = time.perf_counter()
        all_lat = await asyncio.gather(
            *[one_client(c) for c in range(args.clients)])
        dt = time.perf_counter() - t0
        ws_task.cancel()
        try:
            await ws_task
        except asyncio.CancelledError:
            pass
        return all_lat, dt, srv.batcher.n_requests - req0, \
            srv.batcher.n_flushes - fl0

    all_lat, dt, n_req, n_flush = asyncio.run(drive())
    flat = sorted(l for ls in all_lat for l in ls)
    n_windows = len(flat)
    assert n_windows == args.clients * args.windows, "dropped replies"
    frames_per_reply = 8 if args.mode == "recognize" else t_win // 2
    out = {
        "metric": "serving_ws_throughput" if args.mode == "recognize"
                  else "serving_ws_periodic_throughput",
        "clients": args.clients,
        "windows_per_sec": round(n_windows / dt, 2),
        "frames_per_sec": round(frames_per_reply * n_windows / dt, 1),
        "latency_p50_ms": round(1e3 * flat[len(flat) // 2], 1),
        "latency_p95_ms": round(1e3 * flat[int(0.95 * (len(flat) - 1))], 1),
        "backend": "cpu" if args.cpu else "tpu",
    }
    if args.mode == "recognize":
        out["batch_coalescing"] = round(n_req / max(n_flush, 1), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
