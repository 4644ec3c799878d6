"""Optimizer policies and LR schedules in optax.

Re-expresses the reference's per-parameter-group TSN policies
(workoutdetector/models/optimizer.py:38-182 and models/tsm.py:304-407) as a
label-based optax.multi_transform, and its scheduler zoo (StepLR,
cosine/multistep + GradualWarmupScheduler, models/optimizer.py:13-35,
185-253) as optax schedules. SURVEY §7 hard-part 3.

Group → (lr_mult, decay_mult) table (reference optimizer.py:93-182):
    first_conv_weight (1, 1)   first_conv_bias (2, 0)
    normal_weight     (1, 1)   normal_bias     (2, 0)
    bn                (1, 0)   frozen          (0, 0)   [partial-BN]
    lr5_weight        (5, 1)   lr10_bias       (10, 0)  [fc_lr5]
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from workoutdetector_tpu.config import LRSchedulerConfig, OptimizerConfig

POLICY_TABLE: Dict[str, Tuple[float, float]] = {
    "first_conv_weight": (1.0, 1.0),
    "first_conv_bias": (2.0, 0.0),
    "normal_weight": (1.0, 1.0),
    "normal_bias": (2.0, 0.0),
    "bn": (1.0, 0.0),
    "frozen": (0.0, 0.0),
    "lr5_weight": (5.0, 1.0),
    "lr10_bias": (10.0, 0.0),
}


def _is_bn_module(mod: str) -> bool:
    return mod.startswith("bn") or mod.endswith("bn") or "BatchNorm" in mod


def _is_stem_bn(path: Tuple[str, ...]) -> bool:
    """The first BN in reference traversal order is the stem's bn1 —
    the only BN that stays live under partial-BN (tsm.py:285-299)."""
    mod = path[-2]
    return mod == "bn1" and not any(p.startswith("layer") or p.startswith("resnext")
                                    for p in path)


def classify_param(path: Tuple[str, ...],
                   partial_bn: bool = True,
                   fc_lr5: bool = True) -> str:
    """Map a flattened param path to its TSN policy group.

    Mirrors the module-walk of reference tsn_optim_policies
    (optimizer.py:52-91) expressed over param paths instead of live modules.
    """
    leaf = path[-1]
    mod = path[-2] if len(path) >= 2 else ""

    if _is_bn_module(mod) and leaf in ("scale", "bias"):
        if partial_bn and not _is_stem_bn(path):
            return "frozen"
        return "bn"

    if mod in ("fc", "new_fc", "head"):
        if fc_lr5:
            return "lr5_weight" if leaf == "kernel" else "lr10_bias"
        return "normal_weight" if leaf == "kernel" else "normal_bias"

    # stem conv (first conv in reference traversal: models/tsm.py:320-324)
    if mod == "conv1" and not any(
            p.startswith("layer") or p.startswith("resnext") or p == "mse"
            for p in path):
        return "first_conv_weight" if leaf == "kernel" else "first_conv_bias"

    if leaf == "kernel":
        return "normal_weight"
    return "normal_bias"


def label_params(params: Any, partial_bn: bool = True, fc_lr5: bool = True) -> Any:
    """Pytree of policy labels matching ``params``' structure."""
    flat = traverse_util.flatten_dict(params)
    labels = {k: classify_param(k, partial_bn, fc_lr5) for k in flat}
    return traverse_util.unflatten_dict(labels)


def build_schedule(cfg: LRSchedulerConfig,
                   base_lr: float,
                   steps_per_epoch: int,
                   max_epochs: int) -> optax.Schedule:
    """LR schedule factory: steplr | cosine | multistep, with optional
    linear warmup from base_lr/multiplier → base_lr (GradualWarmupScheduler
    semantics, reference optimizer.py:185-226)."""
    policy = cfg.policy.lower()
    warmup_steps = int(cfg.warmup_epochs * steps_per_epoch)
    main_epochs = max(max_epochs - cfg.warmup_epochs, 1)

    if policy in ("steplr", "step"):
        main = optax.exponential_decay(init_value=base_lr,
                                       transition_steps=cfg.step * steps_per_epoch,
                                       decay_rate=cfg.gamma,
                                       staircase=True)
    elif policy == "cosine":
        main = optax.cosine_decay_schedule(init_value=base_lr,
                                           decay_steps=int(main_epochs *
                                                           steps_per_epoch),
                                           alpha=cfg.eta_min / base_lr)
    elif policy == "multistep":
        boundaries = {
            int((m - cfg.warmup_epochs) * steps_per_epoch): cfg.gamma
            for m in cfg.lr_steps
        }
        main = optax.piecewise_constant_schedule(init_value=base_lr,
                                                 boundaries_and_scales=boundaries)
    else:
        raise NotImplementedError(f"lr policy '{cfg.policy}' not supported")

    if warmup_steps > 0:
        warmup = optax.linear_schedule(init_value=base_lr / cfg.warmup_multiplier,
                                       end_value=base_lr,
                                       transition_steps=warmup_steps)
        return optax.join_schedules([warmup, main], [warmup_steps])
    return main


def _sgd_group(lr_mult: float, decay_mult: float, schedule: optax.Schedule,
               momentum: float, weight_decay: float,
               nesterov: bool = False) -> optax.GradientTransformation:
    """torch-SGD-ordered update: wd folds into grad BEFORE momentum
    (torch semantics, which the reference relies on)."""
    if lr_mult == 0.0:
        return optax.set_to_zero()
    parts = []
    if weight_decay * decay_mult > 0:
        parts.append(optax.add_decayed_weights(weight_decay * decay_mult))
    if momentum > 0:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale(lr_mult))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def delayed_clip_by_global_norm(max_norm: float
                                ) -> optax.GradientTransformation:
    """clip_by_global_norm with a one-step-stale threshold: step k
    scales by the norm measured at step k-1 (step 0 runs unclipped).

    Built to test the hypothesis that the standard clip's 6.3 ms/step
    cost (TSM-R50 batch 32, docs/PERF.md round-3 lever table) was the
    scalar BARRIER — no parameter update can begin until every gradient
    leaf exists. With a stale norm the per-leaf scale is known at step
    start, so XLA could overlap leaf updates with the backward tail.
    **The hardware A/B falsified it** (v5e, 2026-08-20): 104.54 ms/step
    delayed vs 104.16 barrier vs 97.9 with clipping off — the cost is
    the norm *reduction* itself (re-walking every gradient leaf), which
    this variant still pays every step, not the data dependence.

    Semantics deviate from the reference's clip_grad_norm (mmaction
    optimizer_config grad_clip) by exactly one step of staleness in the
    threshold. Since the perf is neutral, there is no reason to flip
    ``optimizer.grad_clip_delayed`` on: the default barrier clip is
    reference-exact at the same speed. Kept as the measured record and
    for any backend where the barrier does dominate.
    """

    def init_fn(params):
        del params
        # (prev step's global norm, whether any previous step exists) —
        # an explicit flag, NOT a 0.0 sentinel: a genuinely zero-gradient
        # step must not reset the state and leave the NEXT step unclipped
        return (jnp.asarray(0.0, jnp.float32), jnp.asarray(False))

    def update_fn(updates, state, params=None):
        del params
        prev_norm, seen = state
        scale = jnp.where(
            seen,
            jnp.minimum(1.0, max_norm / jnp.maximum(prev_norm, 1e-16)),
            1.0)
        new_updates = jax.tree_util.tree_map(lambda g: g * scale, updates)
        # norm of the RAW gradients (clip thresholds always measure the
        # unscaled step, matching clip_by_global_norm)
        norm = optax.global_norm(updates).astype(jnp.float32)
        return new_updates, (norm, jnp.asarray(True))

    return optax.GradientTransformation(init_fn, update_fn)


# params exempted from weight decay by leaf name — the reference
# TimeSformer paramwise_cfg sets decay_mult 0 on exactly these
# (configs/timesformer_div_8x4x1_k400.py:96-100)
NO_DECAY_LEAVES = ("cls_token", "pos_embed", "time_embed")


def _decay_mask(params: Any) -> Any:
    flat = traverse_util.flatten_dict(params)
    mask = {k: k[-1] not in NO_DECAY_LEAVES for k in flat}
    return traverse_util.unflatten_dict(mask)


def build_optimizer(opt_cfg: OptimizerConfig,
                    sched_cfg: LRSchedulerConfig,
                    params: Any,
                    steps_per_epoch: int,
                    max_epochs: int,
                    partial_bn: bool = True,
                    fc_lr5: bool = True) -> Tuple[optax.GradientTransformation,
                                                  optax.Schedule]:
    """Build the full optimizer.

    use_tsn_policies ⇒ multi_transform over the policy groups (the
    reference's TSM/TSN path, trainer.py:110-117); otherwise flat SGD/AdamW
    (trainer.py:118-131).
    """
    schedule = build_schedule(sched_cfg, opt_cfg.lr, steps_per_epoch, max_epochs)
    method = opt_cfg.method.lower()

    def clipped(tx: optax.GradientTransformation) -> optax.GradientTransformation:
        # mmaction optimizer_config grad_clip (clip_grad_norm) analog
        if opt_cfg.grad_clip > 0:
            clip = (delayed_clip_by_global_norm(opt_cfg.grad_clip)
                    if opt_cfg.grad_clip_delayed
                    else optax.clip_by_global_norm(opt_cfg.grad_clip))
            return optax.chain(clip, tx)
        return tx

    if opt_cfg.use_tsn_policies and method == "sgd":
        transforms = {
            name: _sgd_group(lr_mult, decay_mult, schedule, opt_cfg.momentum,
                             opt_cfg.weight_decay, opt_cfg.nesterov)
            for name, (lr_mult, decay_mult) in POLICY_TABLE.items()
        }
        labels = label_params(params, partial_bn=partial_bn, fc_lr5=fc_lr5)
        return clipped(optax.multi_transform(transforms, labels)), schedule

    if method == "sgd":
        tx = optax.chain(
            optax.masked(optax.add_decayed_weights(opt_cfg.weight_decay),
                         _decay_mask(params)),
            optax.trace(decay=opt_cfg.momentum, nesterov=opt_cfg.nesterov),
            optax.scale_by_learning_rate(schedule))
        return clipped(tx), schedule
    if method == "adamw":
        return clipped(
            optax.adamw(schedule, eps=opt_cfg.eps,
                        weight_decay=opt_cfg.weight_decay,
                        mask=_decay_mask(params))), schedule
    raise NotImplementedError(f"optimizer '{opt_cfg.method}' not supported")
