"""Minimal plain-JAX training loop — no Trainer, no mesh.

The reference keeps a plain-torch transfer-learning baseline next to its
Lightning harness (workoutdetector/image_classification.py:113-243:
classic loop, best-weights copy). This is that baseline for the TPU
framework: ~80 lines showing exactly what the Trainer automates. Runs on
anything (defaults to a synthetic dataset), keeps the best val weights.

    python examples/simple_train.py [--cpu]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--epochs", type=int, default=3)
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from workoutdetector_tpu.models.resnet import resnet18
    from workoutdetector_tpu.ops.preprocess import normalize_clip

    # synthetic binary image task: bright vs dark
    rng = np.random.default_rng(0)

    def make_split(n):
        y = rng.integers(0, 2, size=n).astype(np.int32)
        base = np.where(y == 0, 60, 200).astype(np.uint8)
        x = np.broadcast_to(base[:, None, None, None], (n, 64, 64, 3)).copy()
        x += rng.integers(0, 30, size=x.shape, dtype=np.uint8)
        return x, y

    train_x, train_y = make_split(64)
    val_x, val_y = make_split(32)

    model = resnet18(num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.sgd(0.01, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x_u8, y):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                normalize_clip(x_u8), train=True, mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(out, y).mean()
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    @jax.jit
    def eval_step(params, batch_stats, x_u8, y):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          normalize_clip(x_u8), train=False)
        return jnp.mean((jnp.argmax(out, -1) == y).astype(jnp.float32))

    best_acc, best_params, best_stats = 0.0, params, batch_stats
    batch = 16
    for epoch in range(args.epochs):
        perm = rng.permutation(len(train_x))
        for i in range(0, len(train_x), batch):
            idx = perm[i:i + batch]
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, jnp.asarray(train_x[idx]),
                jnp.asarray(train_y[idx]))
        acc = float(eval_step(params, batch_stats, jnp.asarray(val_x),
                              jnp.asarray(val_y)))
        print(f"epoch {epoch}: loss={float(loss):.4f} val_acc={acc:.3f}")
        if acc >= best_acc:  # keep a copy of the best weights + BN stats
            best_acc = acc
            best_params, best_stats = jax.tree_util.tree_map(
                lambda a: a.copy(), (params, batch_stats))
    # finish ON the best snapshot (the reference baseline's deepcopy-and-
    # restore behavior) — params AND batch_stats, so the restored pair
    # actually existed together and final eval reproduces the best
    params, batch_stats = best_params, best_stats
    final = float(eval_step(params, batch_stats, jnp.asarray(val_x),
                            jnp.asarray(val_y)))
    print(f"best val_acc={best_acc:.3f} (restored; final eval {final:.3f})")


if __name__ == "__main__":
    main()
