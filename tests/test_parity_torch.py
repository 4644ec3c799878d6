"""torch → JAX numerical parity gates (VERDICT r1 item #2).

The oracle is scripts/torch_tsm.TorchTSM — a reference-semantics torch TSM
whose state dict uses the torchvision key layout, so it flows through
models.convert.port_tsm_checkpoint exactly like a real reference
checkpoint (workoutdetector/models/tsm.py:409-419,451-473). Gates:

  1. ported flax logits ≤ 1e-4 of torch logits on fixed inputs (fp32,
     eval mode, randomized BN running stats — catches mean/var/scale/bias
     mapping bugs, layout transposes, shift-direction flips).
  2. inference_dataset score JSONs from the torch stack vs the JAX stack
     agree: 0 argmax mismatches, identical downstream counts
     (scripts/compare_scores.compare_dirs).
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from workoutdetector_tpu.infer import InferenceEngine, inference_dataset
from workoutdetector_tpu.models import TSM
from workoutdetector_tpu.models.convert import port_tsm_checkpoint
from workoutdetector_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD
from workoutdetector_tpu.scripts.compare_scores import compare_dirs
from workoutdetector_tpu.scripts.torch_tsm import TorchTSM

SIZE = 32


def _randomize_bn(model: torch.nn.Module, seed: int = 0) -> None:
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0.0, 0.2, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)
            m.weight.data.uniform_(0.5, 1.5, generator=g)
            m.bias.data.normal_(0.0, 0.1, generator=g)


def _normalize_np(x_u8: np.ndarray) -> np.ndarray:
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    return (x_u8.astype(np.float32) / 255.0 - mean) / std


def _build_pair(arch: str, num_class: int, num_segments: int,
                shift_place: str = "blockres", seed: int = 0):
    """(torch model, flax model, ported variables) with identical weights."""
    import jax
    import jax.numpy as jnp

    torch.manual_seed(seed)
    tmodel = TorchTSM(num_class=num_class, num_segments=num_segments,
                      base_model=arch, shift_place=shift_place,
                      dropout=0.0).eval()
    _randomize_bn(tmodel, seed)

    fmodel = TSM(num_class=num_class, num_segments=num_segments,
                 base_model=arch, shift_place=shift_place, dropout=0.0,
                 dtype=jnp.float32)
    x0 = jnp.zeros((1, num_segments, SIZE, SIZE, 3), jnp.float32)
    init = fmodel.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    tree = port_tsm_checkpoint(tmodel.state_dict(), num_class=num_class,
                               target_params=init["params"])
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    return tmodel, fmodel, variables


def _both_logits(tmodel, fmodel, variables, x_u8):
    xn = _normalize_np(x_u8)  # (B, T, H, W, C)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(
            np.transpose(xn, (0, 1, 4, 2, 3)).copy())).numpy()
    f_out = np.asarray(fmodel.apply(variables, xn, train=False))
    return t_out, f_out


@pytest.mark.parametrize("arch,shift_place", [
    ("resnet18", "blockres"),
    ("resnet18", "block"),
    ("resnet50", "blockres"),
])
def test_tsm_logits_parity(arch, shift_place):
    tmodel, fmodel, variables = _build_pair(arch, num_class=5,
                                            num_segments=4,
                                            shift_place=shift_place)
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (2, 4, SIZE, SIZE, 3), dtype=np.uint8)
    t_out, f_out = _both_logits(tmodel, fmodel, variables, x)
    assert t_out.shape == f_out.shape == (2, 5)
    np.testing.assert_allclose(f_out, t_out, atol=1e-4, rtol=1e-4)


def test_ported_batch_stats_complete():
    """Every BN stat the flax model initializes must be overwritten by the
    port — a silently-missing running stat is the highest-risk bug class
    (SURVEY §7 hard-part 2)."""
    from flax import traverse_util
    import jax
    import jax.numpy as jnp

    tmodel, fmodel, variables = _build_pair("resnet18", 5, 4)
    init = fmodel.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 4, SIZE, SIZE, 3)), train=False)
    want = set(traverse_util.flatten_dict(init["batch_stats"]).keys())
    got = set(traverse_util.flatten_dict(variables["batch_stats"]).keys())
    assert want == got, f"missing: {want - got}, extra: {got - want}"


class TorchEngine(InferenceEngine):
    """InferenceEngine API over the torch oracle — drives the SAME
    inference_dataset/windowing code so the only variable is the model
    stack."""

    def __init__(self, tmodel, num_segments=8, image_size=SIZE):
        self.model = tmodel
        self.num_segments = num_segments
        self.window_batch = 8
        self.image_size = image_size
        self.input_rank = 5
        self.mesh = None
        self.gather = "host"  # torch oracle scores host-gathered windows

    def score_windows(self, windows_u8: np.ndarray) -> np.ndarray:
        xn = _normalize_np(windows_u8)
        with torch.no_grad():
            out = self.model(torch.from_numpy(
                np.transpose(xn, (0, 1, 4, 2, 3)).copy()))
        return out.numpy()


def test_score_json_parity_end_to_end(tmp_path):
    """Synthetic RepCount videos scored by both stacks → identical argmax
    sequences and identical downstream counts (compare_dirs: 0 mismatches
    within fp tolerance)."""
    import cv2
    import pandas as pd

    tmodel, fmodel, variables = _build_pair("resnet18", num_class=2,
                                            num_segments=8)
    jax_engine = InferenceEngine(fmodel, variables, num_segments=8,
                                 window_batch=8, image_size=SIZE)
    torch_engine = TorchEngine(tmodel, num_segments=8, image_size=SIZE)

    data_root = tmp_path / "RepCount"
    (data_root / "videos" / "val").mkdir(parents=True)
    rng = np.random.default_rng(7)
    names, counts, reps = [], [], []
    for v in range(3):
        name = f"v{v}.mp4"
        w = cv2.VideoWriter(str(data_root / "videos" / "val" / name),
                            cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 64))
        n_frames = int(rng.integers(40, 90))
        for i in range(n_frames):
            frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            w.write(frame)
        w.release()
        names.append(name)
        counts.append(2)
        reps.append("0 10 10 20")
    pd.DataFrame({
        "name": names, "class_": ["squat"] * 3, "split": ["val"] * 3,
        "count": counts, "reps": reps,
        "vid": names, "start": [0] * 3, "end": [0] * 3,
    }).to_csv(data_root / "annotation.csv")

    out_jax = tmp_path / "scores_jax"
    out_torch = tmp_path / "scores_torch"
    for engine, out in ((jax_engine, out_jax), (torch_engine, out_torch)):
        inference_dataset(engine, ["val"], str(out), checkpoint="oracle",
                          data_root=str(data_root),
                          anno_path=str(data_root / "annotation.csv"))

    res = compare_dirs(str(out_jax), str(out_torch), threshold=0.5,
                       softmax=True)
    assert res["videos"] == 3
    assert res["max_abs_score_delta"] < 1e-3, res
    assert res["mean_argmax_agreement"] == 1.0, res
    assert res["count_agreement"] == 1.0, res
    assert res["mean_count_diff"] == 0.0, res


def test_tsm_gradient_parity():
    """Beyond logits: ONE training step's loss and gradients match torch
    through the whole TSM (train-mode BN with batch statistics, shift
    backward, consensus). Guards the backward pass the trainer runs."""
    import jax
    import jax.numpy as jnp
    import optax

    tmodel, fmodel, variables = _build_pair("resnet18", num_class=3,
                                            num_segments=4, seed=2)
    # partial-BN freezes most stats updates in OUR model; disable for the
    # comparison so both sides run full train-mode BN
    fmodel = TSM(num_class=3, num_segments=4, base_model="resnet18",
                 dropout=0.0, partial_bn=False)
    tmodel.train()

    rng = np.random.default_rng(4)
    x = rng.integers(0, 256, (4, 4, SIZE, SIZE, 3), dtype=np.uint8)
    y = np.asarray([0, 1, 2, 1], np.int64)
    xn = _normalize_np(x)

    # --- torch side ---
    xt = torch.from_numpy(np.transpose(xn, (0, 1, 4, 2, 3)).copy())
    xt.requires_grad_(False)
    logits_t = tmodel(xt)
    loss_t = torch.nn.functional.cross_entropy(logits_t,
                                               torch.from_numpy(y))
    loss_t.backward()
    g_conv1_t = tmodel.base_model.conv1.weight.grad.numpy()
    g_fc_t = tmodel.new_fc.weight.grad.numpy()

    # --- jax side ---
    def loss_fn(params):
        out, _ = fmodel.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(xn), train=True, mutable=["batch_stats"])
        return optax.softmax_cross_entropy_with_integer_labels(
            out, jnp.asarray(y)).mean()

    loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
    g_conv1_j = np.transpose(
        np.asarray(grads["backbone"]["conv1"]["kernel"]), (3, 2, 0, 1))
    np.testing.assert_allclose(g_conv1_j, g_conv1_t, atol=2e-4, rtol=1e-3)
    g_fc_j = np.transpose(np.asarray(grads["fc"]["kernel"]), (1, 0))
    np.testing.assert_allclose(g_fc_j, g_fc_t, atol=2e-4, rtol=1e-3)


def test_tsm_temporal_pool_parity():
    """temporal_pool=True path: the oracle's TemporalPool wrapping + the
    half-T shift segments must match our stage-hook pooling exactly."""
    import jax.numpy as jnp

    torch.manual_seed(3)
    tmodel = TorchTSM(num_class=4, num_segments=4, base_model="resnet18",
                      dropout=0.0, temporal_pool=True).eval()
    _randomize_bn(tmodel, 3)

    import jax
    fmodel = TSM(num_class=4, num_segments=4, base_model="resnet18",
                 dropout=0.0, temporal_pool=True, dtype=jnp.float32)
    init = fmodel.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 4, SIZE, SIZE, 3)), train=False)
    tree = port_tsm_checkpoint(tmodel.state_dict(), num_class=4,
                               target_params=init["params"])
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}

    rng = np.random.default_rng(6)
    x = rng.integers(0, 256, (2, 4, SIZE, SIZE, 3), dtype=np.uint8)
    t_out, f_out = _both_logits(tmodel, fmodel, variables, x)
    assert t_out.shape == f_out.shape == (2, 4)
    np.testing.assert_allclose(f_out, t_out, atol=1e-4, rtol=1e-4)
