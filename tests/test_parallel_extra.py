"""Extra multi-chip coverage: sharded inference engine, TDN train step on
the mesh, remat gradient parity, preprocessing tolerance vs PIL."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.infer.engine import InferenceEngine
from workoutdetector_tpu.models import TSM
from workoutdetector_tpu.parallel.mesh import create_mesh, shard_batch
from workoutdetector_tpu.train.trainer import Trainer

SMALL = 16


class TinyModel(nn.Module):
    num_class: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = jnp.mean(x, axis=tuple(range(1, x.ndim)))
        return nn.Dense(self.num_class)(m[:, None])


def test_engine_sharded_over_mesh():
    mesh = create_mesh()
    model = TinyModel()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, SMALL, SMALL, 3)))
    engine = InferenceEngine(model, variables, num_segments=8, window_batch=16,
                             image_size=SMALL, mesh=mesh)
    x = np.random.default_rng(0).integers(0, 256, (10, 8, SMALL, SMALL, 3),
                                          dtype=np.uint8)
    out = engine.score_windows(x)
    assert out.shape == (10, 3)
    # parity vs unsharded
    plain = InferenceEngine(model, variables, num_segments=8, window_batch=16,
                            image_size=SMALL)
    np.testing.assert_allclose(out, plain.score_windows(x), atol=1e-5)


def test_engine_mesh_batch_divisibility():
    mesh = create_mesh()
    model = TinyModel()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, SMALL, SMALL, 3)))
    with pytest.raises(AssertionError):
        InferenceEngine(model, variables, window_batch=12, image_size=SMALL,
                        mesh=mesh)  # 12 % 8 != 0


def test_tdn_train_step_on_mesh(tmp_path):
    cfg = Config()
    cfg.model.model_type = "tdn"
    cfg.model.num_class = 2
    cfg.model.num_segments = 2
    cfg.model.num_frames = 5
    cfg.model.dropout = 0.0
    cfg.model.dtype = "float32"
    cfg.data.image_size = SMALL
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=1, image_size=SMALL)
    step = trainer.train_step_fn()
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (8, 2, 5, SMALL, SMALL, 3), dtype=np.uint8)
    y = rng.integers(0, 2, (8,)).astype(np.int32)
    bx, by = shard_batch((x, y), trainer.mesh)
    state, metrics = step(state, bx, by)
    assert np.isfinite(float(metrics["loss"]))


def test_remat_matches_no_remat():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 4, SMALL, SMALL, 3)).astype(np.float32))
    y = jnp.asarray([1])
    base = TSM(num_class=2, num_segments=4, base_model="resnet18", dropout=0.0)
    rem = TSM(num_class=2, num_segments=4, base_model="resnet18", dropout=0.0,
              remat=True)
    v = base.init(jax.random.PRNGKey(0), x)
    # identical params work for both (remat is graph-only)
    out_b = base.apply(v, x)
    out_r = rem.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_r), atol=1e-5)

    def loss(model, params):
        import optax
        out, _ = model.apply({"params": params, "batch_stats": v["batch_stats"]},
                             x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return optax.softmax_cross_entropy_with_integer_labels(out, y).mean()

    g_b = jax.grad(lambda p: loss(base, p))(v["params"])
    g_r = jax.grad(lambda p: loss(rem, p))(v["params"])
    gb = np.asarray(g_b["backbone"]["conv1"]["kernel"])
    gr = np.asarray(g_r["backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(gb, gr, rtol=1e-4, atol=1e-6)


def test_resize_matches_pil_within_tolerance():
    """SURVEY §7 hard-part 1: our cv2 bilinear short-side resize vs the
    PIL/torchvision semantics the reference used. They differ in antialias
    details; pin the divergence envelope so silent drift is caught."""
    from PIL import Image
    from workoutdetector_tpu.data.transforms import center_crop, resize_short_side

    # a natural-image-like smooth field plus texture (pure noise would
    # magnify aliasing differences beyond anything a video frame shows)
    yy, xx = np.mgrid[0:120, 0:160]
    img = (128 + 80 * np.sin(yy / 9.0) * np.cos(xx / 13.0) +
           np.random.default_rng(0).normal(0, 12, (120, 160))).clip(0, 255)
    img = np.repeat(img[..., None], 3, axis=2).astype(np.uint8)
    ours = center_crop(resize_short_side(img[None], 64), 56)[0]

    pil = Image.fromarray(img)
    h, w = 64, round(160 * 64 / 120)
    pil = pil.resize((w, h), Image.BILINEAR)
    arr = np.asarray(pil)
    y = (h - 56) // 2
    x = (w - 56) // 2
    theirs = arr[y:y + 56, x:x + 56]
    assert ours.shape == theirs.shape
    diff = np.abs(ours.astype(int) - theirs.astype(int)).mean()
    assert diff < 3.0, f"resize divergence too large: {diff}"


def _tiny_tsm_cfg():
    cfg = Config()
    cfg.model.model_type = "tsm"
    cfg.model.base_model = "resnet18"
    cfg.model.num_class = 2
    cfg.model.num_segments = 2
    cfg.model.dropout = 0.0
    cfg.model.dtype = "float32"
    cfg.data.image_size = SMALL
    cfg.data.num_segments = 2
    return cfg


def test_model_axis_partitions_and_matches_replicated():
    """VERDICT r1 #3: the model axis must be real. On a (4,2) mesh large
    kernels hold half the tensor per device, and two train steps + an eval
    produce the same numbers as the fully-replicated (8,1) run."""
    from workoutdetector_tpu.parallel.mesh import param_spec

    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (8, 2, SMALL, SMALL, 3), dtype=np.uint8)
    y = rng.integers(0, 2, (8,)).astype(np.int32)

    results = {}
    for model_axis in (1, 2):
        cfg = _tiny_tsm_cfg()
        mesh = create_mesh(model=model_axis)
        trainer = Trainer(cfg, mesh=mesh)
        state = trainer.init_state(steps_per_epoch=2, image_size=SMALL)
        if model_axis == 2:
            sharded = [p for p in jax.tree_util.tree_leaves(state.params)
                       if not p.sharding.is_fully_replicated]
            assert sharded, "no param partitioned over the model axis"
            for p in sharded:
                shard = p.addressable_shards[0].data.shape
                assert int(np.prod(shard)) * 2 == int(np.prod(p.shape))
        step = trainer.train_step_fn()
        bx, by = shard_batch((x, y), mesh)
        state, m1 = step(state, bx, by)
        state, m2 = step(state, bx, by)
        ev = trainer.eval_step_fn()(state, bx, by)
        results[model_axis] = (float(m1["loss"]), float(m2["loss"]),
                               float(ev["loss"]), int(ev["correct"]),
                               np.asarray(state.params["fc"]["kernel"]))

    a, b = results[1], results[2]
    assert a[3] == b[3]
    np.testing.assert_allclose(a[0], b[0], rtol=1e-5)
    np.testing.assert_allclose(a[1], b[1], rtol=1e-4)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-4)
    np.testing.assert_allclose(a[4], b[4], rtol=1e-4, atol=1e-6)


def test_param_spec_rules():
    from jax.sharding import PartitionSpec as P
    from workoutdetector_tpu.parallel.mesh import param_spec

    mesh = create_mesh(model=2)
    # conv HWIO with big O → sharded on O
    assert param_spec((3, 3, 64, 128), mesh) == P(None, None, None, "model")
    # dense (in, out) with big in → sharded on in
    assert param_spec((512, 12), mesh) == P("model", None)
    # small / non-divisible / 1-D → replicated
    assert param_spec((3, 3, 3, 7), mesh) == P()
    assert param_spec((64,), mesh) == P()
    assert param_spec((), mesh) == P()
    # model axis of 1 → always replicated
    assert param_spec((512, 12), create_mesh(model=1)) == P()


def test_engine_model_axis_sharding_matches_replicated():
    """(4,2)-mesh serving: large kernels hold half per device (real model
    axis in the engine too) and logits match the unsharded engine."""
    import jax.numpy as jnp
    from workoutdetector_tpu.models import TSM

    model = TSM(num_class=3, num_segments=4, base_model="resnet18",
                dropout=0.0, dtype=jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 4, SMALL, SMALL, 3)), train=False)
    mesh = create_mesh(model=2)
    eng = InferenceEngine(model, variables, num_segments=4, window_batch=8,
                          image_size=SMALL, mesh=mesh)
    sharded = [p for p in jax.tree_util.tree_leaves(eng.variables["params"])
               if hasattr(p, "sharding") and not p.sharding.is_fully_replicated]
    assert sharded, "engine params not partitioned over the model axis"

    plain = InferenceEngine(model, variables, num_segments=4, window_batch=8,
                            image_size=SMALL)
    x = np.random.default_rng(0).integers(0, 256, (10, 4, SMALL, SMALL, 3),
                                          dtype=np.uint8)
    np.testing.assert_allclose(eng.score_windows(x), plain.score_windows(x),
                               atol=1e-4, rtol=1e-4)


def test_prefetch_to_device_order_and_sharding():
    """Device prefetch (parallel.mesh.prefetch_to_device): batches come
    out in order, already sharded over 'data', for buffer sizes below,
    at, and above the stream length — including the empty stream."""
    from workoutdetector_tpu.parallel.mesh import prefetch_to_device

    mesh = create_mesh()
    batches = [(np.full((8, 2), i, np.float32), np.full((8,), i, np.int32))
               for i in range(5)]
    for size in (1, 2, 8):
        out = list(prefetch_to_device(iter(batches), mesh, size=size))
        assert len(out) == 5
        for i, (x, y) in enumerate(out):
            assert float(x[0, 0]) == i and int(y[0]) == i
            assert x.sharding.spec == jax.sharding.PartitionSpec("data")
    assert list(prefetch_to_device(iter([]), mesh)) == []
