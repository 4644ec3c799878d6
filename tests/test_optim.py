"""Optimizer-policy and schedule tests (reference semantics:
models/optimizer.py:38-182 policies, :13-35+185-226 schedulers)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from workoutdetector_tpu.config import LRSchedulerConfig, ModelConfig, OptimizerConfig
from workoutdetector_tpu.models import TSM
from workoutdetector_tpu.train.optim import (POLICY_TABLE, build_optimizer,
                                             build_schedule, classify_param,
                                             label_params)


def test_classify_param_paths():
    pbn = dict(partial_bn=True, fc_lr5=True)
    assert classify_param(("backbone", "conv1", "kernel"), **pbn) == "first_conv_weight"
    assert classify_param(("backbone", "bn1", "scale"), **pbn) == "bn"
    assert classify_param(("backbone", "layer1_0", "bn1", "scale"), **pbn) == "frozen"
    assert classify_param(("backbone", "layer1_0", "conv1", "kernel"),
                          **pbn) == "normal_weight"
    assert classify_param(("backbone", "layer2_1", "downsample_conv", "kernel"),
                          **pbn) == "normal_weight"
    assert classify_param(("fc", "kernel"), **pbn) == "lr5_weight"
    assert classify_param(("fc", "bias"), **pbn) == "lr10_bias"
    # no pbn ⇒ body bn live
    assert classify_param(("backbone", "layer1_0", "bn1", "scale"),
                          partial_bn=False, fc_lr5=True) == "bn"
    # no fc_lr5 ⇒ fc is normal
    assert classify_param(("fc", "kernel"), partial_bn=True,
                          fc_lr5=False) == "normal_weight"
    # TDN paths
    assert classify_param(("conv1", "kernel"), **pbn) == "first_conv_weight"
    assert classify_param(("conv1", "bias"), **pbn) == "first_conv_bias"
    assert classify_param(("bn1_5", "scale"), **pbn) == "frozen"
    assert classify_param(("layer2_0", "mse", "conv1", "kernel"),
                          **pbn) == "normal_weight"
    assert classify_param(("layer2_0", "shift", "kernel"), **pbn) == "normal_weight"
    assert classify_param(("new_fc", "kernel"), **pbn) == "lr5_weight"


def test_label_params_covers_tsm():
    model = TSM(num_class=2, num_segments=4, base_model="resnet18")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)))
    labels = label_params(variables["params"], partial_bn=True, fc_lr5=True)
    from flax import traverse_util
    flat = traverse_util.flatten_dict(labels)
    values = set(flat.values())
    assert values <= set(POLICY_TABLE)
    assert "first_conv_weight" in values
    assert "lr5_weight" in values
    assert "frozen" in values
    # exactly one first conv, one live bn pair (stem)
    firsts = [k for k, v in flat.items() if v == "first_conv_weight"]
    assert firsts == [("backbone", "conv1", "kernel")]
    live_bn = [k for k, v in flat.items() if v == "bn"]
    assert sorted(live_bn) == [("backbone", "bn1", "bias"), ("backbone", "bn1", "scale")]


def test_schedule_steplr():
    cfg = LRSchedulerConfig(policy="steplr", gamma=0.1, step=2)
    sched = build_schedule(cfg, base_lr=1.0, steps_per_epoch=10, max_epochs=10)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(19)) == pytest.approx(1.0)
    assert float(sched(20)) == pytest.approx(0.1)
    assert float(sched(40)) == pytest.approx(0.01)


def test_schedule_warmup_cosine():
    cfg = LRSchedulerConfig(policy="cosine", warmup_epochs=1, warmup_multiplier=8.0,
                            eta_min=1e-5)
    sched = build_schedule(cfg, base_lr=0.8, steps_per_epoch=10, max_epochs=11)
    # starts at lr/multiplier, reaches base at warmup end
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(10)) == pytest.approx(0.8, rel=1e-3)
    # decays toward eta_min
    assert float(sched(109)) < 0.01


def test_schedule_multistep():
    cfg = LRSchedulerConfig(policy="multistep", gamma=0.1, lr_steps=[2, 4],
                            warmup_epochs=0)
    sched = build_schedule(cfg, base_lr=1.0, steps_per_epoch=10, max_epochs=6)
    assert float(sched(15)) == pytest.approx(1.0)
    assert float(sched(25)) == pytest.approx(0.1)
    assert float(sched(45)) == pytest.approx(0.01)


def test_frozen_params_get_zero_updates():
    model = TSM(num_class=2, num_segments=4, base_model="resnet18", partial_bn=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)))
    params = variables["params"]
    tx, _ = build_optimizer(OptimizerConfig(), LRSchedulerConfig(), params,
                            steps_per_epoch=10, max_epochs=10, partial_bn=True,
                            fc_lr5=True)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # frozen BN scale/bias must get exactly zero update
    frozen_up = updates["backbone"]["layer1_0"]["bn1"]["scale"]
    np.testing.assert_array_equal(np.asarray(frozen_up), 0.0)
    # stem BN is live
    live_up = updates["backbone"]["bn1"]["scale"]
    assert not np.allclose(np.asarray(live_up), 0.0)
    # fc gets 5x the lr of normal weights (both wd=… but grads=1 so
    # update = -(lr_mult*lr)*(1*wd_terms…): compare magnitudes
    fc_up = np.abs(np.asarray(updates["fc"]["kernel"])).mean()
    normal_up = np.abs(np.asarray(updates["backbone"]["layer1_0"]["conv1"]
                                  ["kernel"])).mean()
    assert fc_up == pytest.approx(5 * normal_up, rel=1e-3)


def test_sgd_matches_torch_semantics():
    """One-param check: wd folds into grad before momentum (torch SGD)."""
    params = {"w": jnp.asarray([2.0])}
    lr, mom, wd = 0.1, 0.9, 0.01
    tx, _ = build_optimizer(
        OptimizerConfig(method="sgd", lr=lr, momentum=mom, weight_decay=wd,
                        use_tsn_policies=False),
        LRSchedulerConfig(policy="steplr", step=1000), params, 1, 1)
    st = tx.init(params)
    g = {"w": jnp.asarray([1.0])}
    up1, st = tx.update(g, st, params)
    # step 1: buf = g + wd*w = 1.02; update = -lr*buf
    assert float(up1["w"][0]) == pytest.approx(-lr * 1.02)
    params2 = {"w": params["w"] + up1["w"]}
    up2, st = tx.update(g, st, params2)
    want_buf = mom * 1.02 + (1.0 + wd * float(params2["w"][0]))
    assert float(up2["w"][0]) == pytest.approx(-lr * want_buf, rel=1e-5)


def test_grad_clip_default_matches_reference():
    """Default grad_clip follows the reference's canonical TSM config
    (optimizer_config grad_clip max_norm=20,
    configs/tsm_MultiActionRepCount_sthv2.py:33): gradients with global
    norm > 20 are rescaled onto the norm-20 sphere BEFORE the SGD
    update; small gradients pass through untouched."""
    assert OptimizerConfig().grad_clip == 20.0
    params = {"w": jnp.zeros((4,))}
    cfg = OptimizerConfig(method="sgd", lr=1.0, momentum=0.0,
                          weight_decay=0.0, use_tsn_policies=False)
    tx, _ = build_optimizer(cfg, LRSchedulerConfig(policy="steplr", step=1000),
                            params, 1, 1)
    st = tx.init(params)
    big = {"w": jnp.full((4,), 50.0)}  # global norm 100
    up, _ = tx.update(big, st, params)
    np.testing.assert_allclose(np.asarray(up["w"]),
                               -np.asarray(big["w"]) * (20.0 / 100.0),
                               rtol=1e-6)
    small = {"w": jnp.full((4,), 1.0)}  # norm 2 < 20: untouched
    up2, _ = tx.update(small, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(up2["w"]), -np.asarray(small["w"]),
                               rtol=1e-6)
    # grad_clip=0 disables clipping entirely
    cfg0 = OptimizerConfig(method="sgd", lr=1.0, momentum=0.0,
                           weight_decay=0.0, use_tsn_policies=False,
                           grad_clip=0.0)
    tx0, _ = build_optimizer(cfg0, LRSchedulerConfig(policy="steplr", step=1000),
                             params, 1, 1)
    up3, _ = tx0.update(big, tx0.init(params), params)
    np.testing.assert_allclose(np.asarray(up3["w"]), -np.asarray(big["w"]),
                               rtol=1e-6)


def test_delayed_grad_clip_semantics():
    """optimizer.grad_clip_delayed: step k is scaled by step k-1's global
    norm (step 0 unclipped) — the pipeline-friendly clip that removes the
    norm-reduction barrier (docs/PERF.md). Exact scale factors checked
    over a 3-step sequence."""
    params = {"w": jnp.zeros((4,))}
    cfg = OptimizerConfig(method="sgd", lr=1.0, momentum=0.0,
                          weight_decay=0.0, use_tsn_policies=False,
                          grad_clip=20.0, grad_clip_delayed=True)
    tx, _ = build_optimizer(cfg, LRSchedulerConfig(policy="steplr", step=1000),
                            params, 1, 1)
    st = tx.init(params)
    big = {"w": jnp.full((4,), 50.0)}    # global norm 100 > 20
    small = {"w": jnp.full((4,), 1.0)}   # global norm 2 < 20

    # step 0: no previous norm -> unclipped, whatever its own norm is
    up0, st = tx.update(big, st, params)
    np.testing.assert_allclose(np.asarray(up0["w"]), -np.asarray(big["w"]),
                               rtol=1e-6)
    # step 1: clipped by step 0's norm (100) -> x 20/100
    up1, st = tx.update(big, st, params)
    np.testing.assert_allclose(np.asarray(up1["w"]),
                               -np.asarray(big["w"]) * (20.0 / 100.0),
                               rtol=1e-6)
    # step 2: previous norm was 100 again (raw norms feed the state, not
    # scaled ones), but the small grad's scale is min(1, 20/100) applied
    # to a small step
    up2, st = tx.update(small, st, params)
    np.testing.assert_allclose(np.asarray(up2["w"]),
                               -np.asarray(small["w"]) * (20.0 / 100.0),
                               rtol=1e-6)
    # step 3: previous norm 2 < 20 -> unclipped
    up3, st = tx.update(big, st, params)
    np.testing.assert_allclose(np.asarray(up3["w"]), -np.asarray(big["w"]),
                               rtol=1e-6)
    # zero-gradient step: the state records norm 0 WITHOUT resetting to
    # the fresh-state flag (they are distinct state fields) — the next
    # step is unclipped because the stale norm estimate is 0 (< max),
    # the documented one-step staleness, not because the state was lost
    zero = {"w": jnp.zeros((4,))}
    up4, st = tx.update(zero, st, params)   # itself clipped by norm 100
    np.testing.assert_allclose(np.asarray(up4["w"]), np.zeros((4,)))
    assert bool(st[0][1]), "seen flag must survive a zero-norm step"
    up5, st = tx.update(big, st, params)
    np.testing.assert_allclose(np.asarray(up5["w"]), -np.asarray(big["w"]),
                               rtol=1e-6)
    # and the step after THAT is clipped by the big norm again
    up6, st = tx.update(big, st, params)
    np.testing.assert_allclose(np.asarray(up6["w"]),
                               -np.asarray(big["w"]) * (20.0 / 100.0),
                               rtol=1e-6)


def test_delayed_clip_convergence():
    """Convergence spot-check for the delayed clip (docs/PERF.md round-3
    lever table): train the SAME noisy regression twice — barrier
    clip_by_global_norm vs delayed_clip_by_global_norm — in a regime
    where the gradient-norm distribution is STATIONARY (label-noise
    floor keeps norms fluctuating around the threshold forever, so the
    clip engages on most steps of both runs). The one-step-stale
    threshold must overlay the exact clip's loss curve within noise:
    staleness is second-order when norms drift slowly. (A transient
    regime would NOT overlay — delayed's step 0 is unclipped by
    construction, and a one-step spike passes through unclipped, the
    semantics already pinned in test_delayed_grad_clip_semantics.)

    Measured here (CPU, seeded): median relative divergence ~0.4%,
    p95 ~0.7%, final-20-step means within 0.2%."""
    from workoutdetector_tpu.train.optim import delayed_clip_by_global_norm

    def run(clip):
        key = jax.random.PRNGKey(0)
        w_true = jax.random.normal(key, (16, 4))
        params = {"w": jnp.zeros((16, 4))}
        tx = optax.chain(clip, optax.sgd(0.02))
        st = tx.init(params)

        @jax.jit
        def step(params, st, k):
            kx, kn = jax.random.split(k)
            x = jax.random.normal(kx, (32, 16))
            # label noise -> gradient norms stay ~N(4, 1) at the optimum
            y = x @ w_true + 5.0 * jax.random.normal(kn, (32, 4))

            def loss_fn(p):
                return jnp.mean((x @ p["w"] - y) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, st2 = tx.update(g, st, params)
            return optax.apply_updates(params, up), st2, loss

        losses = []
        for i in range(240):
            params, st, loss = step(params, st, jax.random.PRNGKey(100 + i))
            losses.append(float(loss))
        return np.array(losses)

    exact = run(optax.clip_by_global_norm(3.0))  # ~p5 of the norm dist
    delayed = run(delayed_clip_by_global_norm(3.0))
    assert np.all(np.isfinite(delayed))
    # same noise floor ...
    np.testing.assert_allclose(delayed[-20:].mean(), exact[-20:].mean(),
                               rtol=0.02)
    # ... along overlapping curves (past the short transient)
    rel = np.abs(delayed[20:] - exact[20:]) / np.maximum(exact[20:], 1e-6)
    assert float(np.median(rel)) < 0.02, float(np.median(rel))
    assert float(np.percentile(rel, 95)) < 0.05
