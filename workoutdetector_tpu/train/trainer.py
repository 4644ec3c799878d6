"""Sharded training loop — the Lightning-equivalent harness, TPU-native.

Capability match of the reference trainer (workoutdetector/trainer.py:25-330
LitModel/DataModule/train/test) re-architected for JAX:

  * ONE jitted train step over a (data, model) Mesh: the global uint8 batch
    is sharded on the data axis (NamedSharding), large params partition over
    the 'model' axis (and over 'data' too under cfg.parallel.fsdp — ZeRO-3),
    and XLA inserts the gradient all-reduce over ICI — the declarative
    equivalent of DDP + gloo (SURVEY §2.8).
  * metrics (loss/acc) are computed on the global batch inside the same
    program — the psum replaces the reference's cross-rank
    ``self.all_gather`` (trainer.py:90).
  * normalize(uint8→float) is traced into the step so it fuses with conv1.
  * partial-BN: frozen stats never update (model-side) and frozen
    scale/bias get zero updates (optimizer-side label 'frozen').
  * checkpointing: orbax, best-by-val-acc + last, with resume
    (reference ModelCheckpoint semantics, trainer.py:230-243).
  * fast_dev_run: one-batch end-to-end smoke (reference
    tests/test_trainer.py:20-57).
"""

from __future__ import annotations

import os
import signal
import threading
import time
from functools import partial
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.data.datasets import build_dataset
from workoutdetector_tpu.data.loader import DataLoader
from workoutdetector_tpu.models.factory import build_model, example_input
from workoutdetector_tpu.ops.preprocess import normalize_clip
from workoutdetector_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                               host_batch_shard,
                                               prefetch_to_device,
                                               replicated_sharding, shard_batch,
                                               state_sharding)
from workoutdetector_tpu.train.loggers import build_loggers
from workoutdetector_tpu.train.optim import build_optimizer


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # exponential moving average of params (cfg.optimizer.ema_decay > 0);
    # None when disabled — an empty pytree subtree, so non-EMA states keep
    # the pre-EMA checkpoint structure and old checkpoints restore cleanly
    ema_params: Any = None


def swap_ema(state: TrainState) -> TrainState:
    """State with the EMA weights promoted to ``params`` (what export /
    serving should ship when EMA training was on). No-op when EMA is off."""
    if state.ema_params is None:
        return state
    return state.replace(params=state.ema_params)


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def collect_sown(tree: Any, name: str) -> list:
    """All values sown under ``name`` anywhere in an intermediates tree
    (sows from submodules land under their module-scope path, e.g.
    block_0/mlp/moe_loss — a top-level lookup misses them)."""
    vals: list = []
    if isinstance(tree, (dict, FrozenDict)):
        for k, v in tree.items():
            if k == name:
                vals.extend(v if isinstance(v, (tuple, list)) else [v])
            else:
                vals.extend(collect_sown(v, name))
    return vals


class Trainer:
    """Train/eval driver. One instance per run."""

    def __init__(self, cfg: Config, mesh: Optional[jax.sharding.Mesh] = None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else create_mesh(
            model=cfg.parallel.model_axis, slices=cfg.parallel.slices)
        self.model = build_model(cfg.model)
        if getattr(cfg.model, "seq_parallel", False) and \
                hasattr(self.model, "seq_mesh"):
            # sequence parallelism: the model pins its token-dim layouts
            # to this mesh (see models/timesformer.py seq_mesh)
            self.model = self.model.clone(seq_mesh=self.mesh)
        self.rng = jax.random.PRNGKey(cfg.seed)
        self.best_val_acc = 0.0
        self._step_fns: Dict[str, Any] = {}
        self._es_best = float("inf") if cfg.callbacks.early_stopping.mode == \
            "min" else float("-inf")
        self._es_count = 0

    # ------------------------------------------------------------------ #
    # state
    # ------------------------------------------------------------------ #
    def init_state(self, steps_per_epoch: int, image_size: int = 224) -> TrainState:
        x = example_input(self.cfg.model, batch=1, image_size=image_size)
        variables = self.model.init({"params": self.rng}, x, train=False)
        params = variables["params"]
        # plain dict (not FrozenDict) so BN-free models (ConvNeXt) produce
        # the same pytree structure the traced step returns
        batch_stats = dict(variables.get("batch_stats", {}))
        # the schedule counts OPTIMIZER updates: under MultiSteps the inner
        # transform (where the schedule's count lives) advances once per
        # grad_accum_steps micro-steps, so size epochs in update steps or
        # warmup/decay would stretch by the accumulation factor
        self._accum = max(self.cfg.trainer.grad_accum_steps, 1)
        update_steps_per_epoch = max(-(-max(steps_per_epoch, 1) //
                                       self._accum), 1)
        self.tx, self.schedule = build_optimizer(self.cfg.optimizer,
                                                 self.cfg.lr_scheduler,
                                                 params,
                                                 steps_per_epoch=update_steps_per_epoch,
                                                 max_epochs=self.cfg.trainer.max_epochs,
                                                 partial_bn=self.cfg.model.partial_bn,
                                                 fc_lr5=self.cfg.model.fc_lr5)
        if self._accum > 1:
            # accumulate micro-batch grads; params update every k-th step
            self.tx = optax.MultiSteps(self.tx, self._accum)
        # ema seeds as a DISTINCT copy of params: the train step donates
        # the whole state, and aliased leaves (same buffer appearing as
        # both params and ema_params) trip XLA's double-donation check
        ema0 = jax.tree_util.tree_map(jnp.copy, params) \
            if self.cfg.optimizer.ema_decay > 0 else None
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=params,
                           batch_stats=batch_stats,
                           opt_state=self.tx.init(params),
                           ema_params=ema0)
        # Lay the state out over the mesh: big kernels (and their optimizer
        # momentum) partition over the 'model' axis, small leaves replicate.
        self._state_sharding = state_sharding(state, self.mesh,
                                              fsdp=self.cfg.parallel.fsdp)
        return jax.device_put(state, self._state_sharding)

    # ------------------------------------------------------------------ #
    # compiled steps
    # ------------------------------------------------------------------ #
    def _make_train_step(self, watch: bool = False):
        model, tx = self.model, self.tx
        base_key = jax.random.PRNGKey(self.cfg.seed + 1)
        aug_key = jax.random.PRNGKey(self.cfg.seed + 2)

        aux_w = self.cfg.model.aux_loss_weight
        moe_w = self.cfg.model.moe_aux_weight
        device_augment = self.cfg.data.device_augment
        out_size = self.cfg.data.image_size
        ema_decay = self.cfg.optimizer.ema_decay

        def train_step(state: TrainState, x_u8: jnp.ndarray, y: jnp.ndarray):
            if device_augment:
                # MultiScaleCrop + flip on device (ops/augment.py): the
                # loader ships square uint8 canvases; the resample and
                # flip fuse with the normalize fma below
                from workoutdetector_tpu.ops.augment import \
                    device_train_augment
                x_u8 = device_train_augment(
                    x_u8, jax.random.fold_in(aug_key, state.step),
                    out_size=out_size)
            x = normalize_clip(x_u8)
            dropout_rng = jax.random.fold_in(base_key, state.step)

            def loss_fn(params):
                out, updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x,
                    train=True,
                    mutable=["batch_stats", "intermediates"],
                    rngs={"dropout": dropout_rng})
                loss = cross_entropy_loss(out, y)
                # auxiliary-head CE (TPN neck aux_head_cfg loss_weight,
                # reference configs/tpn.py:22) — models sow 'aux_logits'.
                # A (B, T, C) sow is DENSE per-frame supervision (RepNet
                # family): the clip label broadcasts over frames.
                inter = updates.get("intermediates", {})
                if "aux_logits" in inter:
                    aux = inter["aux_logits"][0]
                    ya = y
                    if aux.ndim == 3:
                        ya = jnp.repeat(y, aux.shape[1])
                        aux = aux.reshape(-1, aux.shape[-1])
                    loss = loss + aux_w * cross_entropy_loss(aux, ya)
                # MoE load-balance loss (models/moe.py Switch aux): sown
                # per block under its module scope, mean over all sows
                moe = collect_sown(inter, "moe_loss")
                if moe:
                    loss = loss + moe_w * (sum(moe) / len(moe))
                return loss, (out, updates.get("batch_stats", state.batch_stats))

            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
            new_ema = state.ema_params
            if new_ema is not None:
                # EMA of the weights (one fused tree-fma; initialized at
                # the init params, no debias — standard flax practice)
                d = ema_decay
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                    new_ema, new_params)
            new_state = state.replace(step=state.step + 1,
                                      params=new_params,
                                      batch_stats=new_stats,
                                      opt_state=new_opt,
                                      ema_params=new_ema)
            out_metrics = {"loss": loss, "acc": acc}
            if watch:
                # per-leaf grad/param L2 norms (the reference's
                # wandb.watch(model) histograms, trainer.py:266), stacked
                # into two device vectors so the host pays ONE fetch;
                # leaf order matches jax.tree_util.tree_leaves(params)
                # (paths via Trainer.param_leaf_paths)
                gl = jnp.stack([jnp.linalg.norm(g.astype(jnp.float32))
                                for g in jax.tree_util.tree_leaves(grads)])
                pl = jnp.stack([jnp.linalg.norm(p.astype(jnp.float32))
                                for p in
                                jax.tree_util.tree_leaves(new_params)])
                out_metrics["watch_grad_leaf_norms"] = gl
                out_metrics["watch_param_leaf_norms"] = pl
            return new_state, out_metrics

        # out_shardings pins the new state to the same layout as the input
        # state — without it XLA may propagate a 'model' sharding onto small
        # leaves, breaking the eval step's declared in_shardings.
        return jax.jit(
            train_step,
            in_shardings=(self._train_state_sharding(),
                          batch_sharding(self.mesh), batch_sharding(self.mesh)),
            out_shardings=(self._train_state_sharding(),
                           replicated_sharding(self.mesh)),
            donate_argnums=(0,))

    def _make_eval_step(self):
        model = self.model
        use_ema = self.cfg.optimizer.ema_decay > 0

        def eval_step(state: TrainState, x_u8: jnp.ndarray, y: jnp.ndarray):
            x = normalize_clip(x_u8)
            # EMA training evaluates (and therefore selects 'best' by)
            # the averaged weights — the weights you would deploy
            params = state.ema_params if use_ema else state.params
            logits = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=False)
            # label -1 marks loader pad rows (drop_last=False tail batch):
            # keep the compiled shape, exclude them from every metric
            mask = (y >= 0).astype(jnp.float32)
            n = jnp.maximum(jnp.sum(mask), 1.0)
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.maximum(y, 0))
            loss = jnp.sum(losses * mask) / n
            correct = jnp.sum(
                ((jnp.argmax(logits, -1) == y) & (y >= 0)).astype(jnp.int32))
            return {"loss": loss, "correct": correct,
                    "total": jnp.sum(mask).astype(jnp.int32)}

        return jax.jit(
            eval_step,
            in_shardings=(self._train_state_sharding(),
                          batch_sharding(self.mesh), batch_sharding(self.mesh)))

    def _train_state_sharding(self):
        # set by init_state; before that (shouldn't happen in normal flows)
        # fall back to replicated so the step still compiles.
        return getattr(self, "_state_sharding", replicated_sharding(self.mesh))

    def train_step_fn(self, watch: bool = False):
        key = "train_watch" if watch else "train"
        if key not in self._step_fns:
            self._step_fns[key] = self._make_train_step(watch=watch)
        return self._step_fns[key]

    def param_leaf_paths(self, params) -> list:
        """Flattened '/'-joined leaf names in tree_leaves order — the
        labels for the watch step's per-leaf norm vectors."""
        flat, _ = jax.tree_util.tree_flatten_with_path(params)
        return ["/".join(str(getattr(k, "key", k)) for k in path)
                for path, _ in flat]

    def eval_step_fn(self):
        if "eval" not in self._step_fns:
            self._step_fns["eval"] = self._make_eval_step()
        return self._step_fns["eval"]

    # ------------------------------------------------------------------ #
    # loops
    # ------------------------------------------------------------------ #
    def _loader(self, split: str, shuffle: bool) -> DataLoader:
        ds = build_dataset(self.cfg.data, split)
        # multi-host: each process loads only the block of the global
        # batch its devices address, derived from the batch sharding
        # (NOT process_count — a model/pp axis crossing hosts replicates
        # batch rows across processes)
        shard_id, num_shards = host_batch_shard(self.mesh)
        return DataLoader(ds,
                          batch_size=self.cfg.data.batch_size,
                          shuffle=shuffle,
                          num_workers=self.cfg.data.num_workers,
                          seed=self.cfg.seed,
                          # train drops the tail for one static shape per
                          # run; eval keeps every sample via the padded
                          # tail batch (reference drop_last=False)
                          drop_last=(split == "train"),
                          shard_id=shard_id,
                          num_shards=num_shards)

    def evaluate(self, state: TrainState, loader: DataLoader) -> Dict[str, float]:
        eval_step = self.eval_step_fn()
        tot_correct, tot, tot_loss = 0, 0, 0.0
        for batch in prefetch_to_device(iter(loader), self.mesh):
            m = eval_step(state, *batch)
            n = int(m["total"])
            tot_correct += int(m["correct"])
            tot += n
            # weight by real-sample count: the padded tail batch's mean
            # loss covers fewer samples and must not count as a full batch
            tot_loss += float(m["loss"]) * n
        if tot == 0:
            return {"acc": 0.0, "loss": 0.0, "n": 0}
        return {"acc": tot_correct / tot, "loss": tot_loss / tot, "n": tot}

    def fit(self, ckpt_dir: Optional[str] = None) -> Tuple[TrainState, Dict[str, float]]:
        """Full training loop. Returns (final_state, summary metrics)."""
        cfg = self.cfg

        # Preemption handling (absent in the reference, SURVEY §5): on
        # SIGTERM/SIGINT — what a TPU-pod eviction sends — finish the
        # in-flight step, save 'last', and exit cleanly so
        # resume_from_checkpoint continues the run. Installed before the
        # first compile so early signals are caught too.
        preempted = threading.Event()
        prev_handlers = {}
        if threading.current_thread() is threading.main_thread():
            for sig in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[sig] = signal.signal(
                    sig, lambda signum, frame: preempted.set())

        timestamp = time.strftime("%Y%m%d-%H%M%S")
        log_dir = os.path.join(cfg.trainer.default_root_dir, timestamp)
        os.makedirs(log_dir, exist_ok=True)
        loggers = build_loggers(cfg, log_dir)
        loggers.log_hyperparams(cfg.to_dict())

        train_loader = self._loader("train", shuffle=True)
        val_loader = self._loader("val", shuffle=False)
        steps_per_epoch = max(len(train_loader), 1)
        state = self.init_state(steps_per_epoch, image_size=cfg.data.image_size)

        if ckpt_dir is None:
            ckpt_dir = cfg.callbacks.modelcheckpoint.dirpath or log_dir
        from workoutdetector_tpu.train.checkpoint import CheckpointManager
        ckpt = CheckpointManager(ckpt_dir) if cfg.trainer.enable_checkpointing else None
        self._ckpt = ckpt  # train() reloads 'best' from here before test()
        # train() must only test a 'best' that belongs to THIS logical run:
        # a fresh run pointed at a shared dirpath that never saves a best
        # (empty val split) would otherwise silently test a previous run's
        # weights. Saving a best here — or resuming from this dir — marks
        # the checkpoint as ours.
        self._best_is_ours = False
        resume_from = cfg.trainer.resume_from_checkpoint
        if resume_from == "auto":
            # production convenience: the SAME command line restarts a
            # preempted run — resume from this run's 'last' checkpoint
            # when one exists, start fresh otherwise. With exact
            # mid-epoch resume the restart is bit-identical to never
            # having been preempted.
            resume_from = "last" if ckpt is not None and ckpt.exists("last") \
                else None
        if resume_from and ckpt is not None:
            try:
                state, meta = ckpt.restore(resume_from, state)
            except Exception:
                # optimizer config changed since the checkpoint (e.g.
                # grad_accum toggled) → opt_state structure mismatch.
                # Restore weights only and continue with a fresh optimizer.
                restored = ckpt.restore_variables(resume_from,
                                                  prefer_ema=False)
                state = state.replace(params=restored["params"],
                                      batch_stats=restored.get(
                                          "batch_stats", state.batch_stats),
                                      # a pre-EMA checkpoint into an EMA
                                      # run: seed the average at the
                                      # restored weights, not at init
                                      # (copied — aliased leaves would be
                                      # donated twice by the train step)
                                      ema_params=(jax.tree_util.tree_map(
                                          jnp.copy, restored["params"])
                                          if state.ema_params is not
                                          None else None))
                meta = {}
                print("[resume] optimizer state structure changed; restored "
                      "weights only, optimizer starts fresh")
            self.best_val_acc = meta.get("best_val_acc", 0.0)
            self._best_is_ours = True

        train_step = self.train_step_fn()
        # gradient/param watching (reference wandb.watch, trainer.py:266):
        # a separate compiled step that also returns per-leaf norm vectors
        # runs on watch steps only, so the norm reductions cost nothing on
        # the other watch_every-1 steps
        watch_every = cfg.log.watch_every_n_steps
        watch_step = self.train_step_fn(watch=True) if watch_every > 0 else None
        watch_paths = self.param_leaf_paths(state.params) if watch_every > 0 \
            else []
        max_epochs = 1 if cfg.trainer.fast_dev_run else cfg.trainer.max_epochs
        history: Dict[str, float] = {}
        global_step = int(state.step)
        # resume continues the EPOCH budget too (Lightning semantics,
        # reference trainer.py resume_from_checkpoint): a run restored
        # after k epochs trains max_epochs - k more, not max_epochs more.
        # Derived from the restored step count so 'last' checkpoints from
        # older runs (no epoch in meta) resume correctly as well.
        start_epoch = 0 if cfg.trainer.fast_dev_run else \
            min(global_step // steps_per_epoch, max_epochs)
        # exact MID-epoch resume: a run stopped at step s (preemption or
        # max_steps) resumes at batch s % steps_per_epoch of its epoch —
        # the loader skips the already-trained batches without decoding
        # them, and because every rng in the step folds state.step (and
        # the loader's per-item rng folds (seed, epoch, idx)) the resumed
        # run is bit-identical to the uninterrupted one
        # (tests/test_trainer.py::test_resume_mid_epoch_exact)
        resume_skip = 0 if cfg.trainer.fast_dev_run else \
            global_step % steps_per_epoch
        from workoutdetector_tpu.utils.profiling import StepTimer
        timer = StepTimer()
        profiling = False
        es = cfg.callbacks.early_stopping
        # the monitor decides which metric stream feeds early stopping
        # (reference trainer.py:246-251 monitors train/loss) — fetching
        # train metrics every step costs a host sync, so only do it when
        # the configured monitor actually asks for the train stream
        es_on_train = es.enable and es.monitor.startswith("train")
        for epoch in range(start_epoch, max_epochs):
            train_loader.set_epoch(
                epoch, start_batch=resume_skip if epoch == start_epoch else 0)
            epoch_loss_sum, epoch_acc_sum, epoch_steps = 0.0, 0.0, 0
            # device prefetch: batch k+1's H2D overlaps batch k's compute
            for bx, by in prefetch_to_device(iter(train_loader), self.mesh):
                # trace steps [2, 2 + profile_steps): step 1 pays compile
                if cfg.log.profile_steps > 0 and global_step == 1 and not profiling:
                    jax.profiler.start_trace(os.path.join(log_dir, "profile"))
                    profiling = True
                watching = watch_every > 0 and (global_step + 1) % watch_every == 0
                state, metrics = (watch_step if watching else train_step)(
                    state, bx, by)
                global_step += 1
                if watching:
                    gl = np.asarray(metrics.pop("watch_grad_leaf_norms"))
                    pl = np.asarray(metrics.pop("watch_param_leaf_norms"))
                    loggers.log_histograms(
                        {"watch/grad_leaf_norms": gl,
                         "watch/param_leaf_norms": pl},
                        step=global_step, labels=watch_paths)
                    loggers.log_metrics(
                        {"watch/grad_global_norm": float(np.linalg.norm(gl)),
                         "watch/param_global_norm": float(np.linalg.norm(pl))},
                        step=global_step)
                if es_on_train:
                    # accumulate the DEVICE scalars — a float() here would
                    # block every step on a host round-trip (ruinous over
                    # the tunneled backend); the sums are fetched once at
                    # the epoch-end early-stopping check
                    epoch_loss_sum = epoch_loss_sum + metrics["loss"]
                    epoch_acc_sum = epoch_acc_sum + metrics["acc"]
                    epoch_steps += 1
                timer.tick()
                if profiling and global_step >= 1 + cfg.log.profile_steps:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    profiling = False
                if global_step % cfg.trainer.log_every_n_steps == 0 or \
                        cfg.trainer.fast_dev_run:
                    lr = float(self.schedule(
                        global_step // getattr(self, "_accum", 1)))
                    loggers.log_metrics(
                        {
                            "train/loss": float(metrics["loss"]),
                            "train/acc": float(metrics["acc"]),
                            "lr": lr,
                            **timer.stats(cfg.data.batch_size),
                        },
                        step=global_step)
                if cfg.trainer.fast_dev_run:
                    break
                if 0 < cfg.trainer.max_steps <= global_step:
                    break
                if preempted.is_set():
                    break
            if preempted.is_set():
                break

            ran_val = (epoch + 1) % cfg.trainer.check_val_every_n_epoch == 0
            if ran_val:
                val = self.evaluate(state, val_loader)
                loggers.log_metrics({f"val/{k}": v for k, v in val.items()},
                                    step=global_step)
                history = {"val/acc": val["acc"], "val/loss": val["loss"]}
                # an EMPTY val split (n==0) must not overwrite 'best'
                # with a constant 0.0 >= 0.0 every epoch
                if val.get("n", 1) > 0 and val["acc"] >= self.best_val_acc:
                    self.best_val_acc = val["acc"]
                    self._best_is_ours = True
                    if ckpt is not None:
                        ckpt.save(state, name="best",
                                  meta={"best_val_acc": self.best_val_acc,
                                        "epoch": epoch,
                                        "timestamp": timestamp})
                loggers.log_metrics({"val/best_acc": self.best_val_acc},
                                    step=global_step)
            # EarlyStopping on the CONFIGURED monitor (reference
            # trainer.py:246-251: monitor train/loss, mode min).
            # train/* monitors consult the epoch mean of the train stream
            # at EVERY training epoch end (Lightning checks on epoch end,
            # not only on validation epochs); val/* monitors use the
            # validation metrics on the epochs that ran validation.
            # NOTE (resume caveat, intentional): after a mid-epoch resume
            # the resumed epoch's train/* mean covers only its REMAINING
            # batches, so a train-monitored early-stop decision on that
            # one epoch can differ from an uninterrupted run (params and
            # batch_stats stay bit-exact; only the monitor's first sample
            # differs). epoch_steps == 0 (resume landed exactly on an
            # epoch boundary) is skipped outright — a 0.0 mean would read
            # as spuriously 'better' in min mode.
            if es.enable and (es_on_train or ran_val) and \
                    not (es_on_train and epoch_steps == 0):
                if es_on_train:
                    src = {"loss": float(epoch_loss_sum) / max(epoch_steps, 1),
                           "acc": float(epoch_acc_sum) / max(epoch_steps, 1)}
                else:
                    src = val
                metric = src["loss"] if "loss" in es.monitor else src["acc"]
                better = (metric < self._es_best) if es.mode == "min" else \
                    (metric > self._es_best)
                if better:
                    self._es_best = metric
                    self._es_count = 0
                else:
                    self._es_count += 1
                    if self._es_count >= es.patience:
                        break
            if cfg.trainer.fast_dev_run:
                break
            if 0 < cfg.trainer.max_steps <= global_step:
                break
        if profiling:
            jax.profiler.stop_trace()
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)
        if ckpt is not None:
            ckpt.save(state, name="last",
                      meta={"best_val_acc": self.best_val_acc,
                            "preempted": preempted.is_set()})
            # the final (possibly preemption-triggered) save must be
            # durable before the process can exit
            ckpt.wait_until_finished()
        history["best_val_acc"] = self.best_val_acc
        history["preempted"] = float(preempted.is_set())
        loggers.close()
        return state, history

    def test(self, state: TrainState) -> Dict[str, float]:
        split = "test" if self.cfg.data.test.anno or \
            self.cfg.data.dataset_type == "DebugDataset" else "val"
        return self.evaluate(state, self._loader(split, shuffle=False))


def train(cfg: Config) -> Dict[str, float]:
    """Top-level train entry (reference trainer.py:213-322 train()).

    Tests the BEST-val-acc checkpoint, not the end-of-run state: the
    reference intends this too (trainer.py:316-322 calls
    ``model.load_from_checkpoint(best_model_path)``) but DISCARDS the
    return value — ``load_from_checkpoint`` is a classmethod returning a
    new module, so the reference actually tests its final weights (a
    latent reference bug, same adjudication as the shimmed
    inference_video bugs in tests/reference_exec.py). We implement the
    documented intent: reload 'best' before test() when it exists.
    """
    trainer = Trainer(cfg)
    state, history = trainer.fit()
    if not cfg.trainer.fast_dev_run:
        ckpt = getattr(trainer, "_ckpt", None)
        # only a 'best' this run saved (or resumed onto) is trustworthy —
        # a shared dirpath may hold a previous run's checkpoint with a
        # different model structure (silently tested, or an orbax
        # structure error)
        if ckpt is not None and getattr(trainer, "_best_is_ours", True) \
                and ckpt.exists("best"):
            state, _ = ckpt.restore("best", state)
        history.update({f"test/{k}": v for k, v in trainer.test(state).items()})
    return history


def test(cfg: Config) -> Dict[str, float]:
    """Top-level test entry (reference trainer.py:203-210)."""
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=1, image_size=cfg.data.image_size)
    if cfg.checkpoint:
        from workoutdetector_tpu.train.checkpoint import CheckpointManager
        state, _ = CheckpointManager(os.path.dirname(cfg.checkpoint)).restore(
            cfg.checkpoint, state)
    return trainer.test(state)
