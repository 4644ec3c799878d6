"""Trainer tests on the virtual 8-device CPU mesh.

Covers the reference suite's trainer tier (tests/test_trainer.py:20-57
fast-dev-run, tests/test_models.py:24-59 DebugDataset convergence) plus the
distributed tier the reference lacks (SURVEY §4: mesh-parameterized DP)."""

import os

import jax
import numpy as np
import pytest

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.parallel.mesh import create_mesh, shard_batch
from workoutdetector_tpu.train.trainer import Trainer, train


def small_cfg(tmp_path, num_class=2, batch=8, size=16) -> Config:
    cfg = Config()
    cfg.model.model_type = "tsm"
    cfg.model.base_model = "resnet18"
    cfg.model.num_class = num_class
    cfg.model.num_segments = 4
    cfg.model.dropout = 0.0
    cfg.model.dtype = "float32"
    cfg.data.dataset_type = "DebugDataset"
    cfg.data.debug_num_class = num_class
    cfg.data.debug_size = 16
    cfg.data.batch_size = batch
    cfg.data.num_segments = 4
    cfg.data.image_size = size
    cfg.data.num_workers = 2
    cfg.trainer.default_root_dir = str(tmp_path / "exp")
    cfg.trainer.max_epochs = 1
    cfg.trainer.log_every_n_steps = 1
    cfg.log.tensorboard_enable = False
    cfg.optimizer.lr = 0.02
    return cfg


def test_mesh_creation():
    mesh = create_mesh()
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1
    mesh2 = create_mesh(model=2)
    assert mesh2.shape["data"] == 4


def test_shard_batch_places_on_mesh():
    mesh = create_mesh()
    x = np.zeros((16, 4), np.float32)
    (sx,) = shard_batch((x,), mesh)
    assert sx.sharding.spec == jax.sharding.PartitionSpec("data")


def test_fast_dev_run(tmp_path):
    cfg = small_cfg(tmp_path)
    cfg.trainer.fast_dev_run = True
    history = train(cfg)
    assert "best_val_acc" in history


def test_train_step_improves_loss(tmp_path):
    cfg = small_cfg(tmp_path)
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=2, image_size=cfg.data.image_size)
    step = trainer.train_step_fn()
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(8, 4, 16, 16, 3), dtype=np.uint8)
    # label = deterministic function of the mean pixel so it's learnable
    y = (x.reshape(8, -1).mean(1) > 127).astype(np.int32)
    bx, by = shard_batch((x, y), trainer.mesh)
    losses = []
    for _ in range(8):
        state, m = step(state, bx, by)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_debug_dataset_convergence(tmp_path):
    """DebugDataset convergence gate — the reference asserts acc > 0.5
    after 10 epochs on GPU (tests/test_models.py:59); on the CPU mesh we
    train a few epochs at 16px and require better-than-chance accuracy."""
    cfg = small_cfg(tmp_path)
    cfg.trainer.max_epochs = 4
    cfg.optimizer.lr = 0.05
    trainer = Trainer(cfg)
    state, history = trainer.fit()
    result = trainer.test(state)
    assert result["acc"] > 0.5, f"did not converge: {result}"


def test_checkpoint_save_restore(tmp_path):
    cfg = small_cfg(tmp_path)
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=1, image_size=16)
    from workoutdetector_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, name="best", meta={"best_val_acc": 0.75})
    restored, meta = mgr.restore("best", jax.tree_util.tree_map(np.zeros_like, state))
    assert meta["best_val_acc"] == 0.75
    orig_leaf = np.asarray(state.params["backbone"]["conv1"]["kernel"])
    rest_leaf = np.asarray(restored.params["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(orig_leaf, rest_leaf)


def test_resume_from_checkpoint(tmp_path):
    cfg = small_cfg(tmp_path)
    cfg.trainer.max_epochs = 1
    trainer = Trainer(cfg)
    ckpt_dir = str(tmp_path / "ckpts")
    state, _ = trainer.fit(ckpt_dir=ckpt_dir)
    step_after = int(state.step)
    assert step_after > 0

    # a resumed run continues the epoch budget, so train further by
    # raising max_epochs (resuming with the SAME budget is a no-op —
    # see test_resume_continues_epoch_budget)
    cfg2 = small_cfg(tmp_path)
    cfg2.trainer.max_epochs = 2
    cfg2.trainer.resume_from_checkpoint = os.path.join(ckpt_dir, "last")
    trainer2 = Trainer(cfg2)
    state2, _ = trainer2.fit(ckpt_dir=str(tmp_path / "ckpts2"))
    assert int(state2.step) > step_after


def test_resume_continues_epoch_budget(tmp_path):
    """Resume continues the EPOCH count (Lightning semantics): a run that
    already finished k of max_epochs trains max_epochs - k more epochs,
    not max_epochs more. Regression: the epoch loop used to restart at 0
    after restore, doubling the budget of a completed run."""
    cfg = small_cfg(tmp_path)
    cfg.trainer.max_epochs = 2
    trainer = Trainer(cfg)
    ckpt_dir = str(tmp_path / "ckpts")
    state, _ = trainer.fit(ckpt_dir=ckpt_dir)
    steps_full = int(state.step)  # 2 epochs x steps_per_epoch
    assert steps_full == 2 * (16 // 8)

    # resume the COMPLETED run: the epoch budget is spent, so no new
    # steps run (previously it would train 2 more full epochs)
    cfg2 = small_cfg(tmp_path)
    cfg2.trainer.max_epochs = 2
    cfg2.trainer.resume_from_checkpoint = os.path.join(ckpt_dir, "last")
    trainer2 = Trainer(cfg2)
    state2, _ = trainer2.fit(ckpt_dir=str(tmp_path / "ckpts2"))
    assert int(state2.step) == steps_full

    # raising max_epochs trains exactly the difference
    cfg3 = small_cfg(tmp_path)
    cfg3.trainer.max_epochs = 3
    cfg3.trainer.resume_from_checkpoint = os.path.join(ckpt_dir, "last")
    trainer3 = Trainer(cfg3)
    state3, _ = trainer3.fit(ckpt_dir=str(tmp_path / "ckpts3"))
    assert int(state3.step) == steps_full + (16 // 8)


def test_loader_start_batch_skips_exactly():
    """set_epoch(e, start_batch=k) yields exactly the batches an
    uninterrupted pass yields from position k on, bit-for-bit — the basis
    of exact mid-epoch resume (no skipped-batch decode cost either: the
    producer never fetches them)."""
    from workoutdetector_tpu.data.loader import DataLoader

    class Toy:
        def __len__(self):
            return 12

        def __getitem__(self, idx, rng):
            # rng-dependent payload so rng misalignment would be caught
            return (np.full((2, 2), idx, np.uint8) +
                    rng.integers(0, 100, (2, 2), dtype=np.uint8), idx)

    loader = DataLoader(Toy(), batch_size=4, shuffle=True, num_workers=2,
                        seed=3)
    loader.set_epoch(1)
    full = list(loader)
    loader.set_epoch(1, start_batch=2)
    tail = list(loader)
    assert len(full) == 3 and len(tail) == 1
    np.testing.assert_array_equal(full[2][0], tail[0][0])
    np.testing.assert_array_equal(full[2][1], tail[0][1])
    # out-of-range start yields nothing (resume at an epoch boundary)
    loader.set_epoch(1, start_batch=7)
    assert list(loader) == []


def test_loader_process_sharding_matches_global():
    """Multi-host data sharding (torch DistributedSampler role): the
    shard loaders' blocks, concatenated in process order, must equal the
    single-host loader's global batches bit-for-bit — for both drop_last
    modes (pads stay at the global batch tail because the real prefix is
    contiguous), composing with set_epoch/start_batch."""
    from workoutdetector_tpu.data.loader import DataLoader

    class Toy:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, idx, rng):
            return (np.full((3,), idx, np.uint8) +
                    rng.integers(0, 100, (3,), dtype=np.uint8), idx)

    def batches(n, start=0, **kw):
        ld = DataLoader(Toy(n), batch_size=4, shuffle=True, num_workers=2,
                        seed=5, **kw)
        ld.set_epoch(2, start_batch=start)
        return list(ld)

    # n=9 leaves shard 1's tail block ALL pad (probes _item_shape);
    # n=11 splits the tail's real rows across both shards
    for n in (8, 9, 11):
        for drop_last in (True, False):
            full = batches(n, drop_last=drop_last)
            sh = [batches(n, drop_last=drop_last, shard_id=p, num_shards=2)
                  for p in range(2)]
            assert len(sh[0]) == len(sh[1]) == len(full)
            for b in range(len(full)):
                gx = np.concatenate([sh[0][b][0], sh[1][b][0]])
                gy = np.concatenate([sh[0][b][1], sh[1][b][1]])
                np.testing.assert_array_equal(gx, full[b][0],
                                              err_msg=f"n={n} b={b}")
                np.testing.assert_array_equal(gy, full[b][1])
    # mid-epoch resume composes: every shard skips the same global batches
    tail_full = batches(11, start=1, drop_last=True)
    tail_sh = [batches(11, start=1, drop_last=True, shard_id=p, num_shards=2)
               for p in range(2)]
    assert len(tail_full) == len(tail_sh[0]) == 1
    np.testing.assert_array_equal(
        np.concatenate([tail_sh[0][0][0], tail_sh[1][0][0]]), tail_full[0][0])

    with pytest.raises(ValueError, match="divisible"):
        DataLoader(Toy(8), batch_size=6, num_shards=4)
    with pytest.raises(ValueError, match="shard_id"):
        DataLoader(Toy(8), batch_size=8, shard_id=2, num_shards=2)


def test_resume_mid_epoch_exact(tmp_path):
    """A run stopped MID-epoch (max_steps here; preemption in real life)
    and resumed must be bit-identical to the uninterrupted run: the loader
    skips the already-trained batches and every step rng folds state.step,
    so params after resume == params of the straight-through run."""
    cfg = small_cfg(tmp_path)
    cfg.trainer.max_epochs = 2
    trainer = Trainer(cfg)
    state_full, _ = trainer.fit(ckpt_dir=str(tmp_path / "full"))
    steps_per_epoch = 16 // 8
    assert int(state_full.step) == 2 * steps_per_epoch

    # stop 1 step into epoch 1
    cfg2 = small_cfg(tmp_path)
    cfg2.trainer.max_epochs = 2
    cfg2.trainer.max_steps = steps_per_epoch + 1
    ckpt_dir = str(tmp_path / "interrupted")
    trainer2 = Trainer(cfg2)
    state_mid, _ = trainer2.fit(ckpt_dir=ckpt_dir)
    assert int(state_mid.step) == steps_per_epoch + 1

    cfg3 = small_cfg(tmp_path)
    cfg3.trainer.max_epochs = 2
    cfg3.trainer.resume_from_checkpoint = os.path.join(ckpt_dir, "last")
    trainer3 = Trainer(cfg3)
    state_res, _ = trainer3.fit(ckpt_dir=str(tmp_path / "resumed"))
    assert int(state_res.step) == 2 * steps_per_epoch

    flat_full = jax.tree_util.tree_leaves_with_path(state_full.params)
    flat_res = jax.tree_util.tree_leaves_with_path(state_res.params)
    for (pf, lf), (pr, lr_) in zip(flat_full, flat_res):
        assert pf == pr
        np.testing.assert_array_equal(np.asarray(lf), np.asarray(lr_),
                                      err_msg=str(pf))
    for sf, sr in zip(jax.tree_util.tree_leaves(state_full.batch_stats),
                      jax.tree_util.tree_leaves(state_res.batch_stats)):
        np.testing.assert_array_equal(np.asarray(sf), np.asarray(sr))


def test_eval_keeps_tail_partial_batch(tmp_path):
    """drop_last=False eval: a val split not divisible by batch_size must
    still count EVERY sample (the tail batch is padded with label -1 and
    masked in the eval step); the reference evaluates drop_last=False."""
    cfg = small_cfg(tmp_path, batch=8)
    cfg.data.debug_size = 13  # 13 = 8 + padded tail of 5
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=1, image_size=16)
    loader = trainer._loader("val", shuffle=False)
    assert len(loader) == 2
    seen = 0
    for x, y in loader:
        assert x.shape[0] == 8  # static shape preserved
        seen += int((np.asarray(y) >= 0).sum())
    assert seen == 13
    metrics = trainer.evaluate(state, loader)
    assert metrics["n"] == 13


def test_eval_smaller_than_batch_not_empty(tmp_path):
    """A val split smaller than batch_size used to evaluate to nothing
    (acc 0.0) and overwrite 'best' every epoch."""
    cfg = small_cfg(tmp_path, batch=8)
    cfg.data.debug_size = 5
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=1, image_size=16)
    metrics = trainer.evaluate(state, trainer._loader("val", shuffle=False))
    assert metrics["n"] == 5


def test_grad_accum_schedule_counts_update_steps(tmp_path):
    """The LR schedule must be sized in OPTIMIZER updates: under
    optax.MultiSteps(k) the inner schedule advances once per k
    micro-steps, so without the correction warmup/decay stretch by k."""
    def final_lr(accum):
        cfg = small_cfg(tmp_path, batch=8)
        cfg.lr_scheduler.policy = "cosine"
        cfg.trainer.max_epochs = 2
        cfg.trainer.grad_accum_steps = accum
        trainer = Trainer(cfg)
        trainer.init_state(steps_per_epoch=8)
        total_updates = 2 * (8 // accum)
        return float(trainer.schedule(total_updates))

    # after all of training's updates both schedules must have fully
    # annealed (before the fix, the accum run had consumed only 1/4 of
    # its cosine and sat ~15x higher)
    lr_plain = final_lr(1)
    lr_accum = final_lr(4)
    assert abs(lr_plain - lr_accum) < 1e-6, (lr_plain, lr_accum)


def test_async_checkpoint_save_restore(tmp_path):
    """Async saves (the default): save returns while IO runs on a
    background thread; restore / a subsequent save / wait_until_finished
    synchronize with the in-flight write, and rapid back-to-back saves
    don't corrupt each other."""
    from workoutdetector_tpu.train.checkpoint import CheckpointManager
    cfg = small_cfg(tmp_path)
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=1, image_size=16)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, name="a", meta={"k": 1})
    mgr.save(state, name="b", meta={"k": 2})  # overlaps the 'a' write
    restored, meta = mgr.restore("a", jax.tree_util.tree_map(np.zeros_like,
                                                             state))
    assert meta["k"] == 1
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone"]["conv1"]["kernel"]),
        np.asarray(restored.params["backbone"]["conv1"]["kernel"]))
    raw = mgr.restore_variables("b")
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone"]["conv1"]["kernel"]),
        np.asarray(raw["params"]["backbone"]["conv1"]["kernel"]))
    mgr.wait_until_finished()  # idempotent when nothing is in flight


def test_auto_resume_same_command_line(tmp_path):
    """resume_from_checkpoint='auto': the SAME command restarts a
    preempted run from its own 'last' checkpoint (fresh start when none
    exists), and the restart is bit-identical to the uninterrupted run
    thanks to exact mid-epoch resume."""
    ckpt_dir = str(tmp_path / "ckpts")

    def cfg_auto(max_steps=-1):
        cfg = small_cfg(tmp_path)
        cfg.trainer.max_epochs = 2
        cfg.trainer.max_steps = max_steps
        cfg.trainer.resume_from_checkpoint = "auto"
        cfg.callbacks.modelcheckpoint.dirpath = ckpt_dir
        return cfg

    # no checkpoint yet -> 'auto' starts fresh, stops mid-epoch 1
    state_mid, _ = Trainer(cfg_auto(max_steps=3)).fit(ckpt_dir=ckpt_dir)
    assert int(state_mid.step) == 3

    # identical command (minus the preemption stand-in) -> continues
    state_res, _ = Trainer(cfg_auto()).fit(ckpt_dir=ckpt_dir)
    assert int(state_res.step) == 4

    # reference: one uninterrupted run
    cfg = small_cfg(tmp_path / "ref")
    cfg.trainer.max_epochs = 2
    state_full, _ = Trainer(cfg).fit(ckpt_dir=str(tmp_path / "ref_ckpts"))
    for a, b in zip(jax.tree_util.tree_leaves(state_full.params),
                    jax.tree_util.tree_leaves(state_res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _scripted_evaluate(vals):
    """Monkeypatch stand-in for Trainer.evaluate returning scripted
    metrics; the list is consumed in call order (last entry repeats)."""
    it = {"i": 0}

    def fake_evaluate(self, state, loader):
        v = vals[min(it["i"], len(vals) - 1)]
        it["i"] += 1
        return dict(v)

    return fake_evaluate


def test_early_stopping_honors_train_monitor(tmp_path, monkeypatch):
    """`monitor: train/loss` (the defaults.yaml / reference
    trainer.py:246-251 default) must stop on the TRAIN loss stream, not
    silently on val. Regression: the loop used to consult only val
    metrics regardless of the configured monitor."""
    worsening_val = [{"acc": 0.5, "loss": 1.0 + 0.5 * i, "n": 8}
                     for i in range(8)]

    def cfg_es(monitor):
        cfg = small_cfg(tmp_path / monitor.replace("/", "_"))
        cfg.trainer.max_epochs = 4
        cfg.trainer.enable_checkpointing = False
        cfg.callbacks.early_stopping.enable = True
        cfg.callbacks.early_stopping.mode = "min"
        cfg.callbacks.early_stopping.monitor = monitor
        return cfg

    # val/loss monitor + strictly-worsening scripted val -> stops after
    # epoch 2 (patience 1): 2 steps/epoch * 2 epochs = 4 steps
    cfg = cfg_es("val/loss")
    cfg.callbacks.early_stopping.patience = 1
    monkeypatch.setattr(Trainer, "evaluate", _scripted_evaluate(worsening_val))
    state, _ = Trainer(cfg).fit(ckpt_dir=str(tmp_path / "c1"))
    assert int(state.step) == 4

    # train/loss monitor + the SAME worsening val stream -> the val
    # stream must be ignored; train loss decreases on DebugDataset so
    # the run completes all 4 epochs
    cfg = cfg_es("train/loss")
    cfg.callbacks.early_stopping.patience = 3
    monkeypatch.setattr(Trainer, "evaluate", _scripted_evaluate(worsening_val))
    state, _ = Trainer(cfg).fit(ckpt_dir=str(tmp_path / "c2"))
    assert int(state.step) == 8


def test_early_stopping_train_monitor_checks_every_epoch(tmp_path,
                                                         monkeypatch):
    """A train/* monitor is consulted at EVERY training epoch end
    (Lightning checks on train-epoch end), not only on the epochs that
    run validation — with check_val_every_n_epoch=10 a plateaued train
    stream must still stop the run. The loss stream is scripted by
    wrapping the real train step (strictly increasing ⇒ epoch 0 is best,
    epoch 1 exhausts patience 1 ⇒ stop after epoch 2)."""
    import jax.numpy as jnp

    cfg = small_cfg(tmp_path)
    cfg.trainer.max_epochs = 4
    cfg.trainer.enable_checkpointing = False
    cfg.trainer.check_val_every_n_epoch = 10  # validation never runs
    cfg.callbacks.early_stopping.enable = True
    cfg.callbacks.early_stopping.monitor = "train/loss"
    cfg.callbacks.early_stopping.mode = "min"
    cfg.callbacks.early_stopping.patience = 1

    orig_fn = Trainer.train_step_fn

    def patched(self):
        step = orig_fn(self)

        def wrapped(state, bx, by):
            new_state, m = step(state, bx, by)
            m = dict(m)
            m["loss"] = new_state.step.astype(jnp.float32)
            return new_state, m

        return wrapped

    monkeypatch.setattr(Trainer, "train_step_fn", patched)
    state, _ = Trainer(cfg).fit(ckpt_dir=str(tmp_path / "c"))
    assert int(state.step) == 4  # 2 epochs × 2 steps, not 4 × 2


def test_train_ignores_foreign_best(tmp_path, monkeypatch):
    """train() must not test a 'best' checkpoint THIS run never saved:
    a fresh run pointed at a shared dirpath whose val split is empty
    would silently report a previous run's weights (or crash on a
    structure mismatch)."""
    from workoutdetector_tpu.train.checkpoint import CheckpointManager

    shared = str(tmp_path / "shared_ckpts")
    # run A saves a best into the shared dir
    cfg_a = small_cfg(tmp_path / "a")
    cfg_a.callbacks.modelcheckpoint.dirpath = shared
    monkeypatch.setattr(
        Trainer, "evaluate",
        _scripted_evaluate([{"acc": 0.9, "loss": 0.1, "n": 8}]))
    Trainer(cfg_a).fit(ckpt_dir=shared)

    # run B: same dirpath, never saves a best (empty val split), no
    # resume -> train() must NOT restore run A's 'best'
    cfg_b = small_cfg(tmp_path / "b")
    cfg_b.callbacks.modelcheckpoint.dirpath = shared
    cfg_b.trainer.resume_from_checkpoint = None
    monkeypatch.setattr(
        Trainer, "evaluate",
        _scripted_evaluate([{"acc": 0.0, "loss": 0.0, "n": 0}]))
    restored = []
    orig_restore = CheckpointManager.restore

    def spying_restore(self, name, *a, **k):
        restored.append(name)
        return orig_restore(self, name, *a, **k)

    monkeypatch.setattr(CheckpointManager, "restore", spying_restore)
    train(cfg_b)
    assert "best" not in restored


def test_train_reloads_best_before_test(tmp_path, monkeypatch):
    """train() must test the BEST-val-acc checkpoint, not the end-of-run
    state (the reference's documented intent at trainer.py:316-322 —
    its own load_from_checkpoint return value is discarded, a latent
    reference bug)."""
    cfg = small_cfg(tmp_path)
    cfg.trainer.max_epochs = 2
    cfg.callbacks.modelcheckpoint.dirpath = str(tmp_path / "ckpt")
    # val acc peaks at epoch 0 then collapses -> 'best' freezes at the
    # end-of-epoch-0 state while training continues one more epoch
    monkeypatch.setattr(
        Trainer, "evaluate",
        _scripted_evaluate([{"acc": 0.9, "loss": 0.1, "n": 8},
                            {"acc": 0.1, "loss": 9.0, "n": 8}]))
    seen = {}
    orig_test = Trainer.test

    def spy_test(self, state):
        seen["params"] = jax.tree_util.tree_map(np.asarray, state.params)
        return orig_test(self, state)

    monkeypatch.setattr(Trainer, "test", spy_test)
    train(cfg)

    from workoutdetector_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(cfg.callbacks.modelcheckpoint.dirpath)
    best = mgr.restore_variables("best", prefer_ema=False)["params"]
    last = mgr.restore_variables("last", prefer_ema=False)["params"]
    leaf = lambda p: np.asarray(p["backbone"]["conv1"]["kernel"])
    # the state handed to test() is the best checkpoint...
    np.testing.assert_array_equal(leaf(seen["params"]), leaf(best))
    # ...which genuinely differs from the final state
    assert not np.array_equal(leaf(best), leaf(last))


def test_gradient_watch(tmp_path):
    """log.watch_every_n_steps (reference wandb.watch, trainer.py:266):
    the watch step variant returns per-leaf grad/param norm vectors that
    match manual norms, a watched fit writes watch/* columns to the CSV
    logger, and leaf labels line up with param_leaf_paths."""
    cfg = small_cfg(tmp_path)
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=2,
                               image_size=cfg.data.image_size)
    step_w = trainer.train_step_fn(watch=True)
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, size=(8, 4, 16, 16, 3), dtype=np.uint8)
    y = (x.reshape(8, -1).mean(1) > 127).astype(np.int32)
    bx, by = shard_batch((x, y), trainer.mesh)
    new_state, m = step_w(state, bx, by)
    paths = trainer.param_leaf_paths(state.params)
    gl = np.asarray(m["watch_grad_leaf_norms"])
    pl = np.asarray(m["watch_param_leaf_norms"])
    assert gl.shape == pl.shape == (len(paths),)
    assert np.all(np.isfinite(gl)) and np.all(np.isfinite(pl))
    # param norms verify directly against the post-update params
    manual = np.array([float(np.linalg.norm(np.asarray(p, np.float32)))
                       for p in jax.tree_util.tree_leaves(new_state.params)])
    np.testing.assert_allclose(pl, manual, rtol=1e-5)
    # the plain step's metrics carry no watch keys (zero cost off-step)
    _, m_plain = trainer.train_step_fn()(new_state, bx, by)
    assert "watch_grad_leaf_norms" not in m_plain

    # watched fit end-to-end: watch/* columns appear in metrics.csv
    cfg2 = small_cfg(tmp_path / "w")
    cfg2.log.watch_every_n_steps = 2
    cfg2.trainer.max_epochs = 2
    from workoutdetector_tpu.train.trainer import train as train_fn
    train_fn(cfg2)
    import csv as _csv
    import glob
    csv_path = glob.glob(str(tmp_path / "w" / "exp" / "**" / "metrics.csv"),
                         recursive=True)[0]
    with open(csv_path) as f:
        rows = list(_csv.DictReader(f))
    watched = [r for r in rows if r.get("watch/grad_global_norm")]
    assert watched, "no watch rows logged"
    assert "watch/grad_leaf_norms/mean" in rows[0].keys()
    assert any(r.get("watch/grad_leaf_norms/argmax_leaf") for r in rows)
