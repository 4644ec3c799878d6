"""Streaming counter tests: the online state machine must agree with the
batch pred_to_count on every sequence (property test over random streams),
and the frame-level API must count synthetic webcam streams correctly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from workoutdetector_tpu.counting import pred_to_count
from workoutdetector_tpu.infer.engine import InferenceEngine
from workoutdetector_tpu.infer.streaming import OnlineRepCounter, StreamingRepCounter

SIZE = 32


def test_online_counter_matches_batch_property():
    rng = np.random.default_rng(0)
    for trial in range(200):
        n = int(rng.integers(1, 40))
        preds = rng.integers(-1, 6, size=n).tolist()
        want_count, want_reps = pred_to_count(preds, step=8)
        oc = OnlineRepCounter(step=8)
        completions = sum(oc.push_state(p) for p in preds)
        assert oc.count == want_count, (preds, oc.count, want_count)
        assert oc.reps == want_reps, (preds, oc.reps, want_reps)
        assert completions == want_count


def test_online_counter_incremental_signal():
    oc = OnlineRepCounter(step=8)
    seq = [0, 0, 1, 1, 0, 1]
    flags = [oc.push_state(p) for p in seq]
    assert flags == [False, False, True, False, False, True]
    assert oc.count == 2


class BrightModel(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        m = jnp.mean(x, axis=tuple(range(1, x.ndim)))
        return jnp.stack([-m * 10, m * 10], axis=-1)


def test_streaming_rep_counter_frames():
    model = BrightModel()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, SIZE, SIZE, 3)))
    engine = InferenceEngine(model, variables, num_segments=8, window_batch=4,
                             image_size=SIZE)
    sc = StreamingRepCounter(engine, window=8)
    updates = []
    # stream 3 cycles of dark(16 frames) → bright(16 frames) at 96×96
    for _ in range(3):
        for val in (20, 235):
            for _ in range(16):
                u = sc.push(np.full((96, 96, 3), val, np.uint8))
                if u is not None:
                    updates.append(u)
    assert len(updates) == 96 // 8
    assert updates[-1]["count"] == 3
    completed = [u for u in updates if u["rep_completed"]]
    assert len(completed) == 3
    # counts are monotonically non-decreasing and live
    counts = [u["count"] for u in updates]
    assert counts == sorted(counts)

    sc.reset()
    assert sc.counter.count == 0 and sc.states == []


def test_streaming_periodic_counter_mechanics():
    """StreamingPeriodicCounter accumulates Σ 1/period over the NEWEST
    hop frames only — overlapping windows never double-count — and
    reports periods in raw-frame units under rate decimation."""
    from types import SimpleNamespace

    from workoutdetector_tpu.infer.streaming import StreamingPeriodicCounter

    T, C, wb, S = 16, 8, 4, 24

    def conf_fn(chunk):  # all frames confidently period-4 (class 3)
        out = np.full((wb, T, C), -10.0, np.float32)
        out[:, :, 3] = 10.0
        return out

    eng = SimpleNamespace(num_segments=T, image_size=S, window_batch=wb,
                          _repnet_fn=conf_fn)
    c = StreamingPeriodicCounter(eng, scale=S)
    frames = np.zeros((96, S, S, 3), np.uint8)
    statuses = [s for s in (c.push(f) for f in frames) if s]
    # first score at frame 16 counts all T frames, then one per hop=8
    assert len(statuses) == 1 + (96 - T) // (T // 2)
    assert abs(c.fractional - 96 / 4) < 1e-6
    assert statuses[-1]["count"] == 24
    assert statuses[-1]["period_frames"] == 4
    assert statuses[-1]["strength"] > 0.99

    # rate decimation halves the frames the model sees; reported period
    # doubles back into raw-frame units and the count stays consistent
    c2 = StreamingPeriodicCounter(eng, scale=S, rate=2)
    st2 = [s for s in (c2.push(f) for f in frames) if s]
    assert abs(c2.fractional - 48 / 4) < 1e-6
    assert st2[-1]["period_frames"] == 8

    # aperiodic logits contribute nothing
    def ap_fn(chunk):
        out = np.full((wb, T, C), -10.0, np.float32)
        out[:, :, 0] = 10.0
        return out

    eng0 = SimpleNamespace(num_segments=T, image_size=S, window_batch=wb,
                           _repnet_fn=ap_fn)
    c0 = StreamingPeriodicCounter(eng0, scale=S)
    st0 = [s for s in (c0.push(f) for f in frames) if s]
    assert c0.count == 0 and st0[-1]["strength"] < 0.01
    assert st0[-1]["period_frames"] == 0

    # reset restarts the warmup
    c.reset()
    assert c.count == 0 and c.fractional == 0.0
    assert c.push(frames[0]) is None
