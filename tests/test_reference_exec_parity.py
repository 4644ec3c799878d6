"""Parity gates against the reference's OWN executing code.

Every other parity test in this suite compares against re-implemented
oracles. These gates load the reference's source from /root/reference
(tests/reference_exec.py — absent deps stubbed at import time, nothing
copied) and execute it as the oracle:

  * pred_to_count / obo_mae / to_softmax — bit-level agreement on
    randomized inputs (reference utils/inference_count.py:114-165,
    utils/eval.py:11-24, utils/visualize.py:140-150).
  * eval main — OUR ``_write_score_json`` artifacts, fed to the
    reference's published-metric eval (utils/eval.py:117-180), produce
    the same per-video counts, MAE and OBO as our eval_score_dir.
  * analyze_count — same meta CSV from both implementations
    (utils/eval.py:58-114).
  * TemporalShift.shift / InplaceShift / TemporalPool — bit-exact vs our
    XLA ops (models/tsm.py:34-80,95-101).
  * create_model — the genuine reference TSM module (shift injection,
    child-slicing, consensus forward; models/tsm.py:188-476) ported
    through models.convert and matched by our flax TSM to ≤1e-4.
  * sample_frames — deterministic path bit-equal over a sweep
    (datasets/transform.py:16-65).
  * get_scheduler / GradualWarmupScheduler — full per-iteration LR curves
    (models/optimizer.py:13-36,185-253) vs train/optim.build_schedule.
  * MultiScaleCrop / ThreeCrop — exhaustive candidate × offset crop
    geometry (datasets/transform.py:265-382) vs data/transforms.
  * count_by_image_model — the 7-deque id-sum vote loop
    (utils/inference_count.py:190-243) with scripted per-frame scores.
  * eval_dataset — the whole split walk → count → eval_count → CSV
    (utils/inference_count.py:424-512), video + image branches.
  * TDNDataset.sample_indices — bit-equal on a shared RandomState stream
    (datasets/tdn_dataset.py:98-125).
  * RepcountDataset.get_video_list — identical span lists over the REAL
    annotation pack (datasets/repcount_dataset.py:254-406), with the
    max_reps<1 docstring-vs-code reference bug documented.
  * FrameDataset / ImageDataset — the rawframe hot loop
    (datasets/common.py:16-170): 3-/4-column annotation parsing,
    deterministic sampling and clip assembly, pixel-for-pixel.
  * relabel tooling (scripts/mpvscreenshot_process.py:11-70) —
    screenshot-name parsing + byte-identical screenshots_to_csv
    (which surfaced a real 0/1/0-vs-0/1/2 labeling divergence, fixed),
    with the ≥1 h minute-arithmetic reference bug documented.
  * build_workout (scripts/build_datasets.py:64-161) — the Workouts
    merge over the reference's REAL classes.txt packs: all five
    remapped label lists byte-identical.

All tests skip when /root/reference is not mounted.
"""

import json
import os
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_exec import (REF_ROOT, load_ref_eval,
                            load_ref_inference_count, load_ref_repcount_dataset,
                            load_ref_tdn, load_ref_transform, load_ref_tsm,
                            load_ref_visualize, pandas_append_shim,
                            reference_available)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not mounted")

from workoutdetector_tpu import counting


# ---------------------------------------------------------------- counting


def _random_pred_sequences(n_seqs: int = 400):
    rng = np.random.default_rng(0)
    for i in range(n_seqs):
        length = int(rng.integers(0, 60))
        n_classes = int(rng.integers(2, 13))
        # mix background and class runs — runs make state changes likely
        seq = []
        while len(seq) < length:
            state = int(rng.integers(-1, n_classes))
            seq.extend([state] * int(rng.integers(1, 6)))
        yield seq[:length], int(rng.integers(1, 17))


def test_pred_to_count_reference_executable():
    ic = load_ref_inference_count()
    golden = [-1, -1, 6, 6, 6, 7, 6, 6, 6, 7, 6, 6, 7, 7, 6, 6, 7, 7, 6, 6,
              7, 7, 6, 6, 7, 7, -1]
    assert ic.pred_to_count(golden, step=8) == \
        counting.pred_to_count(golden, step=8) == \
        (6, [16, 40, 48, 72, 80, 96, 112, 128, 144, 160, 176, 192])
    for seq, step in _random_pred_sequences():
        ref = ic.pred_to_count(list(seq), step=step)
        got = counting.pred_to_count(list(seq), step=step)
        assert got == ref, (seq, step)


def test_obo_mae_reference_executable():
    ev = load_ref_eval()
    rng = np.random.default_rng(1)
    for _ in range(50):
        n = int(rng.integers(1, 40))
        preds = rng.integers(0, 30, n).tolist()
        gts = rng.integers(0, 30, n).tolist()
        for ratio in (True, False):
            ref = ev.obo_mae(preds, gts, ratio=ratio)
            got = counting.obo_mae(preds, gts, ratio=ratio)
            assert got == tuple(ref), (preds, gts, ratio)


def test_to_softmax_reference_executable():
    vis = load_ref_visualize()
    rng = np.random.default_rng(2)
    for _ in range(25):
        n = int(rng.integers(2, 13))
        d = {str(i): float(rng.normal(0, 2)) for i in range(n)}
        ref = vis.to_softmax(dict(d))
        got = counting.to_softmax(dict(d))
        assert list(ref.keys()) == list(got.keys())
        np.testing.assert_allclose(list(got.values()), list(ref.values()),
                                   atol=1e-6)


# -------------------------------------------------------- eval pipeline

ACTIONS = ["squat", "pull_up"]
SPLITS = ["val", "test"]


def _make_score_dir(tmp_path, n_classes: int, seed: int = 3):
    """Score JSONs through OUR writer (infer._write_score_json) + a matching
    annotation csv — the artifacts the reference eval then consumes."""
    import pandas as pd

    from workoutdetector_tpu.infer.inference_count import _write_score_json

    rng = np.random.default_rng(seed)
    json_dir = tmp_path / "scores"
    json_dir.mkdir()
    engine = types.SimpleNamespace(num_segments=8, image_size=224)
    names, counts, reps, splits, classes = [], [], [], [], []
    v = 0
    for split in SPLITS:
        for action in ACTIONS:
            for _ in range(2):
                name = f"vid{v}"
                v += 1
                n_chunks = int(rng.integers(6, 20))
                starts = np.arange(n_chunks) * 8
                logits = rng.normal(0.45, 0.35, (n_chunks, n_classes))
                item = types.SimpleNamespace(video_name=name,
                                             reps=[0, 10, 10, 20],
                                             class_=action)
                _write_score_json(engine, item, int(starts[-1] + 16), starts,
                                  logits, "ckpt", str(json_dir))
                names.append(name + ".mp4")
                counts.append(int(rng.integers(0, 8)))
                reps.append("0 10 10 20")
                splits.append(split)
                classes.append(action)
    anno = tmp_path / "annotation.csv"
    pd.DataFrame({
        "name": names, "count": counts, "reps": reps, "split": splits,
        "class_": classes,
    }).to_csv(anno, index=False)
    return str(json_dir), str(anno)


@pytest.mark.parametrize("softmax", [False, True])
def test_eval_main_reference_bit_match(tmp_path, capsys, softmax):
    """Our score JSONs through the reference's published-metric eval main:
    per-video counts identical, MAE/OBO identical to eval_score_dir."""
    import pandas as pd

    ev = load_ref_eval()
    # 2 classes keeps softmax maxima straddling the 0.5 threshold so both
    # the -1/background and the counted paths are exercised
    json_dir, anno = _make_score_dir(tmp_path, n_classes=2)

    ref_csv = str(tmp_path / "ref_eval.csv")
    ev.main(json_dir, anno, ref_csv, softmax=softmax)
    printed = capsys.readouterr().out
    assert "Mean absolute error" in printed

    mae, obo, rows = counting.eval_score_dir(json_dir, anno,
                                             out_csv=str(tmp_path / "our.csv"),
                                             softmax=softmax)
    # the reference prints to 4dp — match the formatted figures exactly
    assert f"Mean absolute error: {mae:.4f}, OBO acc: {obo:.4f}" in printed

    ref_df = pd.read_csv(ref_csv, index_col="name")
    ours = {r["name"]: r for r in rows}
    assert set(ref_df.index) == set(ours.keys())
    for name, row in ref_df.iterrows():
        assert int(row["pred_count"]) == ours[name]["pred_count"], name
        assert int(row["gt_count"]) == ours[name]["gt_count"], name
        assert row["pred_rep"] == str(ours[name]["pred_rep"]), name
        assert row["split"] == ours[name]["split"], name
        assert row["action"] == ours[name]["action"], name
    # exact metric recomputation from the per-video counts
    ref_mae, ref_obo = ev.obo_mae(ref_df["pred_count"].tolist(),
                                  ref_df["gt_count"].tolist())
    assert (mae, obo) == (ref_mae, ref_obo)
    # at least one video counted and one backgrounded (gate is non-trivial)
    assert ref_df["pred_count"].max() > 0


def test_analyze_count_reference_bit_match(tmp_path, capsys):
    import pandas as pd

    ev = load_ref_eval()
    json_dir, anno = _make_score_dir(tmp_path, n_classes=2, seed=4)
    eval_csv = str(tmp_path / "eval.csv")
    counting.eval_score_dir(json_dir, anno, out_csv=eval_csv)

    ref_out = str(tmp_path / "ref_meta.csv")
    with pandas_append_shim():
        ev.analyze_count(eval_csv, ref_out)
    capsys.readouterr()
    our_df = counting.analyze_count(eval_csv)
    ref_df = pd.read_csv(ref_out, index_col=0)

    assert list(ref_df.columns) == list(our_df.columns)
    assert len(ref_df) == len(our_df) == len(ACTIONS) * len(SPLITS) + len(SPLITS)
    assert ref_df["action"].tolist() == our_df["action"].tolist()
    assert ref_df["split"].tolist() == our_df["split"].tolist()
    for col in ("mae", "obo_acc", "total", "avg_count"):
        np.testing.assert_allclose(our_df[col].to_numpy(float),
                                   ref_df[col].to_numpy(float), atol=0,
                                   err_msg=col)


def test_reference_inference_dataset_exec_windowing_parity(tmp_path,
                                                           monkeypatch,
                                                           capsys):
    """The reference's inference_dataset loop EXECUTES end-to-end
    (utils/inference_count.py:351-421: RepcountHelper walk, window starts
    every 8 frames, vid[i:i+16:2] sparse sampling, tail zero-pad, the ONNX
    inference_video call path, score-JSON schema + naming) with its model
    calls served by OUR engine through a session shim; our
    inference_dataset over the same videos and weights produces score
    JSONs with identical window keys, near-identical scores, and identical
    downstream counts. This pins the windowing semantics our engine
    claims, against the code that defines them."""
    import cv2
    import pandas as pd

    import jax
    import jax.numpy as jnp

    from test_infer import SIZE, BrightnessModel, _write_video
    from workoutdetector_tpu.data.video import VideoReader
    from workoutdetector_tpu.infer import InferenceEngine, inference_dataset
    from workoutdetector_tpu.scripts.compare_scores import compare_dirs

    ic = load_ref_inference_count()
    # the loader stubs the workoutdetector package; wire the GENUINE
    # reference RepcountHelper (itself loaded executable) back in
    ic.RepcountHelper = load_ref_repcount_dataset().RepcountHelper

    model = BrightnessModel()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, SIZE, SIZE, 3)))
    engine = InferenceEngine(model, variables, num_segments=8,
                             window_batch=4, image_size=SIZE)

    # dataset at the hardcoded reference location (~/data/RepCount)
    monkeypatch.setenv("HOME", str(tmp_path))
    root = tmp_path / "data" / "RepCount"
    (root / "videos" / "val").mkdir(parents=True)
    names = []
    for v, pattern in enumerate(([40, 220, 40, 220, 40, 220],
                                 [220, 40, 220, 40],
                                 [40, 40, 220, 220, 40])):
        name = f"v{v}.mp4"
        # 9 frames per state: total not divisible by the 8-frame step, so
        # the tail zero-pad branch executes on every video
        _write_video(root / "videos" / "val" / name, pattern,
                     frames_per_state=9)
        names.append(name)
    pd.DataFrame({
        "name": names, "class_": ["squat"] * 3, "split": ["val"] * 3,
        "count": [3, 2, 1], "reps": ["0 9 18 27 36 45"] * 3,
        "vid": names, "start": [0] * 3, "end": [0] * 3,
    }).to_csv(root / "annotation.csv")

    # both stacks must see the same pixels: back the reference's read_video
    # with our prep decode (float, so its torch.cat zero-pad — which runs on
    # EVERY window because `len(clip) < 16` is always true for an 8-frame
    # sparse sample — doesn't dtype-clash with the uint8 frames)
    def read_video(path, **kwargs):
        with VideoReader(path) as r:
            v = r.read_prepped(256, SIZE)
        return torch.from_numpy(v).float(), None, {}

    ic.read_video = read_video
    ic.build_test_transform = lambda person_crop=False: (lambda x: x)

    class EngineSession(ic.onnxruntime.InferenceSession):
        """The reference treats the model as an onnxruntime session; serve
        those calls from our engine (prep is identity-exact: float frames
        are integral, so the uint8 round-trip loses nothing)."""

        def get_inputs(self):
            return [types.SimpleNamespace(name="input")]

        def run(self, _, feed):
            x = feed["input"]  # (1, 8, 3, H, W) float
            u8 = np.transpose(x, (0, 1, 3, 4, 2)).astype(np.uint8)
            return [np.asarray(engine.score_windows(u8))]

    ref_out = tmp_path / "ref_scores"
    ic.inference_dataset(EngineSession(), ["val"], str(ref_out),
                         checkpoint="oracle")
    capsys.readouterr()

    our_out = tmp_path / "our_scores"
    inference_dataset(engine, ["val"], str(our_out), checkpoint="oracle",
                      data_root=str(root),
                      anno_path=str(root / "annotation.csv"))

    assert sorted(os.listdir(ref_out)) == sorted(os.listdir(our_out)) \
        == sorted(f"{n}.score.json" for n in names)
    for f in sorted(os.listdir(ref_out)):
        ref = json.load(open(ref_out / f))
        ours = json.load(open(our_out / f))
        assert list(ref["scores"].keys()) == list(ours["scores"].keys()), f
        assert ref["total_frames"] == ours["total_frames"]
        assert ref["ground_truth"] == ours["ground_truth"]
        assert ref["action"] == ours["action"]
    res = compare_dirs(str(ref_out), str(our_out), threshold=0.5,
                       softmax=True)
    assert res["videos"] == 3
    assert res["max_abs_score_delta"] < 1e-4, res
    assert res["mean_argmax_agreement"] == 1.0, res
    assert res["count_agreement"] == 1.0, res
    assert res["mean_count_diff"] == 0.0, res


def test_reference_count_by_video_model_exec_parity(tmp_path, capsys):
    """The reference's count_by_video_model EXECUTES (cv2 frame loop,
    8-frame deque, non-overlapping chunks, dropped tail, pred_to_count
    wiring; utils/inference_count.py:285-339) and agrees with ours on
    counts and rep boundaries.

    Two latent reference bugs keep the function from running as written —
    both shimmed at the inference_video seam, everything else executes
    verbatim: (1) it calls inference_video without a transform, which the
    ONNX branch asserts on; (2) it takes `pred[0][0]` as the class, which
    assumes the score-sorted output inference_video's own docstring shows
    (:238) but the implementation returns enumerate() order — unpatched,
    every chunk would classify as class 0."""
    import jax
    import jax.numpy as jnp

    from test_infer import SIZE, BrightnessModel, _write_video
    from workoutdetector_tpu.data.transforms import (center_crop,
                                                     resize_short_side)
    from workoutdetector_tpu.infer import InferenceEngine
    from workoutdetector_tpu.infer.inference_count import count_by_video_model

    ic = load_ref_inference_count()
    model = BrightnessModel()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, SIZE, SIZE, 3)))
    engine = InferenceEngine(model, variables, num_segments=8,
                             window_batch=4, image_size=SIZE)

    def prep_transform(x):
        # the engine's deployment geometry on the raw frames the reference
        # loop queues (BGR→RGB already done by the loop)
        clip = x.numpy().astype(np.uint8)
        clip = center_crop(resize_short_side(clip, 256), SIZE)
        return torch.from_numpy(clip).float()

    class EngineSession(ic.onnxruntime.InferenceSession):
        def get_inputs(self):
            return [types.SimpleNamespace(name="input")]

        def run(self, _, feed):
            u8 = feed["input"].astype(np.uint8)  # (1, 8, SIZE, SIZE, 3)
            return [np.asarray(engine.score_windows(u8))]

    orig_inference_video = ic.inference_video

    def patched_inference_video(m, inputs, threshold=0.5, transform=None):
        pred = orig_inference_video(m, inputs, threshold,
                                    transform or prep_transform)
        return sorted(pred, key=lambda t: -t[1])  # the documented contract

    ic.inference_video = patched_inference_video

    # 9 frames/state: 54 frames → 6 full chunks + a dropped 6-frame tail;
    # chunk boundaries straddle state changes, so the gate is sensitive to
    # off-by-one windowing
    path = _write_video(tmp_path / "v.mp4", [40, 220, 40, 220, 40, 220],
                        frames_per_state=9)
    ref_count, ref_reps = ic.count_by_video_model(EngineSession(), path,
                                                  ground_truth=[0, 9, 18, 27])
    capsys.readouterr()
    our_count, our_reps = count_by_video_model(engine, path)
    assert (our_count, our_reps) == (ref_count, list(ref_reps))
    assert ref_count > 0  # non-trivial: transitions actually counted


# ------------------------------------------------------------- model ops


def test_temporal_shift_reference_executable():
    """Reference TemporalShift.shift (copy AND in-place autograd variants)
    vs our XLA shift — bit-exact through a layout transpose."""
    import jax
    from workoutdetector_tpu.ops.temporal_shift import (temporal_shift,
                                                        temporal_shift_flat)

    tsm = load_ref_tsm()
    rng = np.random.default_rng(5)
    for b, t, c, hw, fold_div in [(2, 4, 16, 5, 8), (1, 8, 24, 3, 8),
                                  (3, 2, 8, 4, 4)]:
        x = rng.normal(size=(b * t, c, hw, hw)).astype(np.float32)
        ref = tsm.TemporalShift.shift(torch.from_numpy(x.copy()), t,
                                      fold_div=fold_div,
                                      inplace=False).numpy()
        ref_inplace = tsm.InplaceShift.apply(
            torch.from_numpy(x.copy()).view(b, t, c, hw, hw),
            c // fold_div).view(b * t, c, hw, hw).numpy()
        # forward of the in-place autograd variant == the copy variant
        np.testing.assert_array_equal(ref_inplace, ref)

        x_nhwc = np.transpose(x.reshape(b, t, c, hw, hw), (0, 1, 3, 4, 2))
        got = np.asarray(temporal_shift(jax.numpy.asarray(x_nhwc), fold_div))
        got_nchw = np.transpose(got, (0, 1, 4, 2, 3)).reshape(b * t, c, hw, hw)
        np.testing.assert_array_equal(got_nchw, ref)

        flat = np.transpose(x, (0, 2, 3, 1))  # (B*T, H, W, C)
        got_flat = np.asarray(
            temporal_shift_flat(jax.numpy.asarray(flat), t, fold_div))
        np.testing.assert_array_equal(
            np.transpose(got_flat, (0, 3, 1, 2)), ref)


def test_temporal_pool_reference_executable():
    """Reference TemporalPool.temporal_pool vs the PRODUCTION TSM stage
    hook (models/tsm.py _stage_hook — the max(3,s2,p1)-over-T pool the
    shipped model applies in front of stage 2), called directly on the
    same tensor."""
    import jax.numpy as jnp

    from workoutdetector_tpu.models import TSM

    tsm = load_ref_tsm()
    rng = np.random.default_rng(6)
    for b, t, c, hw in [(2, 8, 6, 4), (1, 4, 3, 5)]:
        x = rng.normal(size=(b * t, c, hw, hw)).astype(np.float32)
        ref = tsm.TemporalPool.temporal_pool(torch.from_numpy(x.copy()),
                                             n_segment=t).numpy()

        fmodel = TSM(num_class=2, num_segments=t, base_model="resnet18",
                     temporal_pool=True, dtype=jnp.float32)
        # the hook sees (B*T, H, W, C) and must halve T (stage_idx 1)
        v = jnp.asarray(np.transpose(x.reshape(b, t, c, hw, hw),
                                     (0, 1, 3, 4, 2)).reshape(b * t, hw, hw, c))
        pooled = fmodel._stage_hook(v, stage_idx=1)
        got = np.transpose(
            np.asarray(pooled).reshape(b, t // 2, hw, hw, c),
            (0, 1, 4, 2, 3)).reshape(b * t // 2, c, hw, hw)
        np.testing.assert_array_equal(got, ref)
        # every other stage passes through untouched
        np.testing.assert_array_equal(
            np.asarray(fmodel._stage_hook(v, stage_idx=0)), np.asarray(v))


@pytest.mark.parametrize("shift_place", ["blockres", "block"])
def test_reference_tsm_model_exec_parity(shift_place):
    """The genuine reference TSM module (create_model → shift injection →
    forward with consensus), ported via models.convert, matches our flax
    TSM logits. The backbone is layout-identical TorchResNet (torchvision
    absent); everything wrapping it is reference code executing."""
    import jax
    import jax.numpy as jnp

    from workoutdetector_tpu.models import TSM
    from workoutdetector_tpu.models.convert import port_tsm_checkpoint
    from test_parity_torch import _randomize_bn

    tsm = load_ref_tsm()
    torch.manual_seed(0)
    tmodel = tsm.create_model(num_class=5, num_segments=4,
                              base_model="resnet18", checkpoint=None,
                              device="cpu", shift_place=shift_place)
    # NOTE reference quirk: TSM.train() returns None (unlike nn.Module), so
    # .eval() — which returns self.train(False) — returns None; call it as
    # a statement (the reference's own __main__ does the same).
    tmodel.eval()
    _randomize_bn(tmodel, seed=7)

    fmodel = TSM(num_class=5, num_segments=4, base_model="resnet18",
                 shift_place=shift_place, dropout=0.0, dtype=jnp.float32)
    init = fmodel.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 4, 32, 32, 3), jnp.float32), train=False)
    tree = port_tsm_checkpoint(tmodel.state_dict(), num_class=5,
                               target_params=init["params"])
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}

    rng = np.random.default_rng(8)
    xn = rng.normal(0, 1, (2, 4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(
            np.transpose(xn, (0, 1, 4, 2, 3)).reshape(8, 3, 32, 32).copy()))
    f_out = np.asarray(fmodel.apply(variables, jnp.asarray(xn), train=False))
    assert f_out.shape == tuple(t_out.shape) == (2, 5)
    np.testing.assert_allclose(f_out, t_out.numpy(), atol=1e-4, rtol=1e-4)


def test_reference_tdn_model_exec_parity(tmp_path, monkeypatch):
    """The genuine reference TDN (models/tdn.py FBResNet/BottleneckShift/
    mSEModule/ShiftModule + models/tsn.py TSN wrapper), built through the
    reference's own create_model — including its local-pretrained-checkpoint
    load branch — ported via port_tdn_checkpoint and matched by our flax
    TDN. 64×64 is the smallest size the reference's fixed stem pools
    accept."""
    import jax
    import jax.numpy as jnp

    from workoutdetector_tpu.models.convert import port_tdn_checkpoint
    from workoutdetector_tpu.models.tdn import TDN

    tdn = load_ref_tdn()
    # the reference backbone factory loads a local file
    # 'checkpoints/finetune/resnet50-19c8e357.pth' relative to CWD when
    # pretrained=True (the default reached through TSN._prepare_base_model);
    # pre-seed it so that branch executes too (zero egress — the weights are
    # a fresh FBResNet's own state dict).
    monkeypatch.chdir(tmp_path)
    (tmp_path / "checkpoints" / "finetune").mkdir(parents=True)
    torch.manual_seed(1)
    seed_sd = tdn.fbresnet50(4, pretrained=False).state_dict()
    torch.save(seed_sd, str(tmp_path / "checkpoints" / "finetune" /
                            "resnet50-19c8e357.pth"))

    torch.manual_seed(0)
    tmodel = tdn.create_model(num_class=3, num_segments=4,
                              base_model="resnet50", num_frames=5,
                              checkpoint=None, dropout=0.5)
    tmodel.eval()  # reference train() returns None — statement, not chain
    # mild BN randomization: still exercises every running-stat mapping but
    # keeps fp32 accumulation over the 50-layer net tight (~3e-6 observed;
    # aggressive gamma∈[0.5,1.5] compounds to |logits|≈240 and ~0.04 drift)
    g = torch.Generator().manual_seed(2)
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.05, generator=g)
                m.running_var.uniform_(0.9, 1.1, generator=g)
                m.weight.uniform_(0.9, 1.1, generator=g)
                m.bias.normal_(0.0, 0.02, generator=g)

    fmodel = TDN(num_class=3, num_segments=4, num_frames=5, dropout=0.0,
                 dtype=jnp.float32)
    init = fmodel.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 4, 5, 64, 64, 3), jnp.float32),
                       train=False)
    tree = port_tdn_checkpoint(tmodel.state_dict(), num_class=3,
                               target_params=init["params"])
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}

    rng = np.random.default_rng(9)
    xn = rng.normal(0, 1, (1, 4, 5, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(
            np.transpose(xn, (0, 1, 2, 5, 3, 4)).copy())).numpy()
    f_out = np.asarray(fmodel.apply(variables, jnp.asarray(xn), train=False))
    assert f_out.shape == t_out.shape == (1, 3)
    np.testing.assert_allclose(f_out, t_out, atol=1e-4, rtol=1e-4)


# ------------------------------------------------------------- sampling


def test_repcount_helper_reference_executable(tmp_path):
    """Reference RepcountHelper (datasets/repcount_dataset.py:152-251),
    executing over the REAL shipped annotation pack, vs ours: identical
    item dicts (names, classes, counts, rep boundaries, splits, paths) and
    bit-equal eval_count metrics — including the divide-by-items quirk our
    docstring pins."""
    anno = os.path.join(REF_ROOT, "datasets", "RepCount", "annotation.csv")
    if not os.path.isfile(anno):
        pytest.skip("reference annotation pack not shipped")

    from workoutdetector_tpu.data.repcount import RepcountHelper

    rd = load_ref_repcount_dataset()
    root = str(tmp_path)
    ref_helper = rd.RepcountHelper(root, anno)
    our_helper = RepcountHelper(root, anno)
    assert ref_helper.classes == our_helper.classes

    splits = ["train", "val", "test"]
    ref_items = ref_helper.get_rep_data(splits, ["all"])
    our_items = our_helper.get_rep_data(splits, ["all"])
    assert set(ref_items) == set(our_items) and len(ref_items) > 700
    for name, ref_it in ref_items.items():
        it = our_items[name]
        for field in ("video_path", "frames_path", "total_frames", "class_",
                      "count", "reps", "split", "video_name"):
            assert it[field] == ref_it[field], (name, field)

    # eval_count: perturb ground truth deterministically (+1 every 3rd,
    # -1 every 7th) over the val split, compare metrics bit-for-bit
    val_ref = ref_helper.get_rep_data(["val"], ["all"])
    pred = {name: max(0, item.count + (i % 3 == 0) - (i % 7 == 0))
            for i, (name, item) in enumerate(sorted(val_ref.items()))}
    ref_mae, ref_obo, ref_pred = ref_helper.eval_count(pred, ["val"], ["all"])
    our_mae, our_obo, our_pred = our_helper.eval_count(pred, ["val"], ["all"])
    assert (our_mae, our_obo) == (ref_mae, ref_obo)
    assert set(ref_pred) == set(our_pred)
    for name in ref_pred:
        assert our_pred[name].mae == ref_pred[name].mae
        assert our_pred[name].obo_acc == ref_pred[name].obo_acc
        assert our_pred[name].pred_count == ref_pred[name].pred_count

    # module-level eval_count (repcount_dataset.py:104-112) vs counting
    preds = [it.count for it in list(val_ref.values())[:40]]
    gts = [max(0, p + (i % 4 == 1) * 2 - (i % 5 == 2)) for i, p in enumerate(preds)]
    assert counting.obo_mae(preds, gts) == tuple(rd.eval_count(preds, gts))


def test_build_label_list_reference_executable(tmp_path, capsys):
    """Reference build_label_list (repcount_dataset.py:18-85) and ours,
    both run over the REAL shipped annotation pack, write byte-identical
    train/val/test.txt image manifests."""
    anno = os.path.join(REF_ROOT, "datasets", "RepCount", "annotation.csv")
    if not os.path.isfile(anno):
        pytest.skip("reference annotation pack not shipped")

    from workoutdetector_tpu.data.repcount import ACTIONS, build_label_list

    rd = load_ref_repcount_dataset()
    ref_out = tmp_path / "ref"
    our_out = tmp_path / "ours"
    rd.build_label_list(str(tmp_path / "RepCount"), anno, list(ACTIONS),
                        str(ref_out), overwrite=True)
    capsys.readouterr()
    build_label_list(str(tmp_path / "RepCount"), anno, list(ACTIONS),
                     str(our_out), overwrite=True)
    for split in ("train", "val", "test"):
        ref_txt = (ref_out / f"{split}.txt").read_text()
        our_txt = (our_out / f"{split}.txt").read_text()
        assert ref_txt and ref_txt == our_txt, split


def test_optim_policies_reference_executable():
    """Reference TSM.get_optim_policies (models/tsm.py:304-408), executing
    on the real module tree, vs our path-based label_params on the ported
    flax params: per-group lr/decay multipliers, tensor counts and total
    element counts all agree (partial-BN freezing = our 'frozen' label =
    tensors absent from every reference group)."""
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from workoutdetector_tpu.models import TSM
    from workoutdetector_tpu.models.convert import port_tsm_checkpoint
    from workoutdetector_tpu.train.optim import POLICY_TABLE, label_params

    tsm = load_ref_tsm()
    torch.manual_seed(0)
    tmodel = tsm.create_model(num_class=5, num_segments=4,
                              base_model="resnet18", checkpoint=None,
                              device="cpu", fc_lr5=True)
    # latent reference bug: TSM.get_optim_policies reads self.modality
    # (models/tsm.py:446) but only the TSN wrapper ever sets it — executing
    # the walk requires supplying the attribute TSN provides (tsn.py:129)
    tmodel.modality = "RGB"
    groups = tmodel.get_optim_policies()

    fmodel = TSM(num_class=5, num_segments=4, base_model="resnet18",
                 dropout=0.0, dtype=jnp.float32)
    init = fmodel.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 4, 32, 32, 3), jnp.float32), train=False)
    tree = port_tsm_checkpoint(tmodel.state_dict(), num_class=5,
                               target_params=init["params"])
    labels = traverse_util.flatten_dict(
        label_params(tree["params"], partial_bn=True, fc_lr5=True))
    flat = traverse_util.flatten_dict(tree["params"])

    ours = {}
    for path, lab in labels.items():
        n, numel = ours.get(lab, (0, 0))
        ours[lab] = (n + 1, numel + int(np.asarray(flat[path]).size))

    ref_total = 0
    for g in groups:
        # the reference names the BN group "BN scale/shift"; ours is 'bn'
        name = {"BN scale/shift": "bn"}.get(g["name"], g["name"])
        params = g["params"]
        if not params:
            assert name not in ours or name == "first_conv_bias", name
            continue
        ref_total += len(params)
        assert POLICY_TABLE[name] == (g["lr_mult"], g["decay_mult"]), name
        n, numel = ours.get(name, (0, 0))
        assert n == len(params), (name, n, len(params))
        assert numel == sum(p.numel() for p in params), name
    # partial-BN: tensors in NO reference group == our 'frozen' label
    n_frozen = ours.get("frozen", (0, 0))[0]
    assert ref_total + n_frozen == len(labels)
    assert n_frozen > 0


def test_sample_frames_reference_executable():
    from workoutdetector_tpu.data.sampling import sample_frames

    tr = load_ref_transform()
    for total in (1, 2, 3, 4, 7, 8, 10, 16, 40, 100, 301):
        for num in (1, 4, 8, 16):
            for offset in (0, 5):
                ref = tr.sample_frames(total, num, offset, random=False)
                got = sample_frames(total, num, offset, random=False)
                assert got == list(ref), (total, num, offset)


# --------------------------------------------------------------- schedules


@pytest.mark.parametrize("policy,warmup", [("cosine", 0), ("cosine", 2),
                                           ("multistep", 0), ("multistep", 2)])
def test_gradual_warmup_scheduler_reference_executable(policy, warmup):
    """The reference's GradualWarmupScheduler + get_scheduler EXECUTE
    (models/optimizer.py:13-36,185-253 — pure torch.optim, stepped
    per-iteration exactly as the TDN harness does) and our
    train/optim.build_schedule reproduces the full LR-vs-iteration curve:
    warmup from base/multiplier → base over warmup_epoch·n_iter steps,
    then the after-scheduler re-based at iteration warmup·n_iter."""
    import warnings

    from reference_exec import load_ref_optimizer
    from workoutdetector_tpu.config import LRSchedulerConfig
    from workoutdetector_tpu.train.optim import build_schedule

    ref = load_ref_optimizer()
    base_lr, spe, epochs = 0.32, 5, 10
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # explicit-epoch step deprecation
        sched = ref.get_scheduler(opt, n_iter_per_epoch=spe,
                                  lr_scheduler=policy, lr_decay_rate=0.1,
                                  warmup_epoch=warmup, lr_steps=[4, 7],
                                  epochs=epochs, warmup_multiplier=8.0)
        ref_lrs = []
        for _ in range(spe * epochs):
            ref_lrs.append(opt.param_groups[0]["lr"])
            sched.step()

    cfg = LRSchedulerConfig()
    cfg.policy = policy
    cfg.gamma = 0.1
    cfg.lr_steps = [4, 7]
    cfg.warmup_epochs = warmup
    cfg.warmup_multiplier = 8.0
    cfg.eta_min = 0.00001  # get_scheduler hardcodes this for cosine
    ours = build_schedule(cfg, base_lr, steps_per_epoch=spe,
                          max_epochs=epochs)
    our_lrs = [float(ours(i)) for i in range(spe * epochs)]
    np.testing.assert_allclose(our_lrs, ref_lrs, rtol=1e-5, atol=1e-9)
    if warmup:  # the curve actually warms up: first lr is base/multiplier
        assert abs(ref_lrs[0] - base_lr / 8.0) < 1e-12


# -------------------------------------------------------------- transforms


class _ForcedRandom:
    """Stand-in for the `random` module inside the loaded reference
    transform: forces choice()/randint() outcomes by index while recording
    the candidate lists the reference enumerates."""

    def __init__(self, picks):
        self.picks = list(picks)
        self.recorded = []

    def choice(self, seq):
        self.recorded.append(list(seq))
        return seq[self.picks.pop(0)]

    def randint(self, a, b):  # inclusive, like random.randint
        self.recorded.append((a, b))
        v = self.picks.pop(0)
        assert a <= v <= b
        return v


class _ForcedRng:
    """numpy-Generator stand-in driving OUR transforms to the same picks."""

    def __init__(self, picks):
        self.picks = list(picks)

    def integers(self, low, high=None, size=None):
        assert size is None
        v = self.picks.pop(0)
        assert low <= v < (high if high is not None else low)
        return v


@pytest.mark.parametrize("scales,num_fixed", [((1.0, 0.875, 0.75, 0.66), 5),
                                              ((1.0, 0.875, 0.75, 0.66), 13),
                                              ((1.0, 0.8), 13)])
def test_multiscale_crop_reference_executable(scales, num_fixed):
    """The reference MultiScaleCrop EXECUTES (datasets/transform.py:294-382)
    over every (candidate size × fixed offset) pair — forced through its
    own random.choice — and our data/transforms.MultiScaleCrop produces the
    identical candidate enumeration AND the identical cropped pixels for
    every pair, plus the identical inclusive offset range under
    random_crop=True."""
    from workoutdetector_tpu.data.transforms import MultiScaleCrop

    tr = load_ref_transform()
    rng = np.random.default_rng(11)
    # non-square, both orientations
    for (h, w) in [(96, 128), (130, 70)]:
        clip = rng.integers(0, 256, size=(2, 3, h, w), dtype=np.uint8)
        t_clip = torch.from_numpy(clip.copy())
        # our layout is (T, H, W, C)
        our_clip = np.transpose(clip, (0, 2, 3, 1))

        ref_msc = tr.MultiScaleCrop(scales=scales, random_crop=False,
                                    num_fixed_crops=num_fixed)
        ours = MultiScaleCrop(scales=scales, random_crop=False,
                              num_fixed_crops=num_fixed)
        base = min(h, w)
        sizes = [int(base * s) for s in scales]
        n_candidates = sum(1 for i in range(len(sizes))
                           for j in range(len(sizes)) if abs(i - j) <= 1)
        for si in range(n_candidates):
            for oi in range(num_fixed):
                forced = _ForcedRandom([si, oi])
                tr.random = forced  # the module-global `random` the class uses
                ref_out = ref_msc(t_clip).numpy()
                got = ours(our_clip, _ForcedRng([si, oi]))
                # identical candidate-size enumeration, identical pixels
                assert len(forced.recorded[0]) == n_candidates
                np.testing.assert_array_equal(
                    np.transpose(got, (0, 3, 1, 2)), ref_out)

        # random_crop=True: same inclusive offset ranges, same pixels
        ref_rc = tr.MultiScaleCrop(scales=scales, random_crop=True)
        our_rc = MultiScaleCrop(scales=scales, random_crop=True)
        for si in range(n_candidates):
            probe = _ForcedRandom([si, 0, 0])
            tr.random = probe
            ref_rc(t_clip)
            # recorded: candidate list, then the two inclusive randint ranges
            (_, (x_lo, x_hi), (y_lo, y_hi)) = probe.recorded
            assert (x_lo, y_lo) == (0, 0)
            # drive both at the extreme corner of the offset range — the
            # spot an exclusive/inclusive mismatch would surface
            forced_ref = _ForcedRandom([si, x_hi, y_hi])
            tr.random = forced_ref
            ref_out = ref_rc(t_clip).numpy()
            got = our_rc(our_clip, _ForcedRng([si, x_hi, y_hi]))
            np.testing.assert_array_equal(
                np.transpose(got, (0, 3, 1, 2)), ref_out)


def test_three_crop_reference_executable():
    """The reference ThreeCrop EXECUTES (datasets/transform.py:265-291);
    ours yields the identical three top-left candidates and pixels in both
    orientations."""
    from workoutdetector_tpu.data.transforms import ThreeCrop

    tr = load_ref_transform()
    rng = np.random.default_rng(12)
    ours = ThreeCrop()
    for (h, w) in [(96, 128), (130, 70)]:
        clip = rng.integers(0, 256, size=(2, 3, h, w), dtype=np.uint8)
        t_clip = torch.from_numpy(clip.copy())
        our_clip = np.transpose(clip, (0, 2, 3, 1))
        ref_tc = tr.ThreeCrop()
        for k in range(3):
            forced = _ForcedRandom([k])
            tr.random = forced
            ref_out = ref_tc(t_clip).numpy()
            assert len(forced.recorded[0]) == 3
            got = ours(our_clip, _ForcedRng([k]))
            np.testing.assert_array_equal(
                np.transpose(got, (0, 3, 1, 2)), ref_out)


def test_reference_count_by_image_model_exec_parity(tmp_path, capsys):
    """The reference's count_by_image_model EXECUTES (cv2 frame loop,
    7-deque vote `sum(que) >= 4` on raw argmax ids — including the
    multi-class id-sum quirk — then pred_to_count(step=7);
    utils/inference_count.py:190-243) with its per-frame inference_image
    calls served by a scripted scorer; our count_by_image_model over the
    same scripted per-frame scores returns identical (count, reps)."""
    from test_infer import _write_video
    from workoutdetector_tpu.infer.inference_count import count_by_image_model

    ic = load_ref_inference_count()

    # 3-phase pattern, 9 frames per state → vote windows straddle states
    path = _write_video(tmp_path / "img.mp4",
                        [40, 220, 40, 220, 40, 220, 40], frames_per_state=9)
    n_frames = 63
    rng = np.random.default_rng(3)
    # multi-class scores: argmax ids in {0, 1, 2} exercise the id-SUM vote
    scripted = rng.normal(size=(n_frames, 3)).astype(np.float32)
    calls = {"i": 0}

    def scripted_inference_image(model, frame, threshold=0.5):
        assert frame is not None and frame.ndim == 3  # a real decoded frame
        s = scripted[calls["i"]]
        calls["i"] += 1
        return s

    ic.inference_image = scripted_inference_image
    ref_count, ref_reps = ic.count_by_image_model(object(), str(path))
    capsys.readouterr()
    assert calls["i"] == n_frames  # the cv2 loop really saw every frame

    class ScriptedEngine:
        image_size = 32

        def score_images(self, video):
            assert len(video) == n_frames
            return scripted.copy()

    # threshold=0 → the pure reference loop (its own threshold is dead code)
    our_count, our_reps = count_by_image_model(ScriptedEngine(), str(path),
                                               threshold=0.0)
    assert (our_count, our_reps) == (ref_count, list(ref_reps))
    assert ref_count > 0

    # the default threshold=0.1 must not change behavior when max softmax
    # stays above it (the reference's documented-but-dead semantics)
    strong = np.where(scripted == scripted.max(1, keepdims=True), 9.0, 0.0)

    def strong_scorer(model, frame, threshold=0.5):
        s = strong[calls["i"] % n_frames]
        calls["i"] += 1
        return s

    calls["i"] = 0
    ic.inference_image = strong_scorer
    ref2 = ic.count_by_image_model(object(), str(path))
    capsys.readouterr()

    class StrongEngine(ScriptedEngine):
        def score_images(self, video):
            return strong.copy()

    our2 = count_by_image_model(StrongEngine(), str(path), threshold=0.1)
    assert (our2[0], list(our2[1])) == (ref2[0], list(ref2[1]))


def test_tdn_sample_indices_reference_executable():
    """The reference TDNDataset.sample_indices EXECUTES
    (datasets/tdn_dataset.py:98-125 — the TDN official burst sampler,
    all three branches) and our data/sampling.tdn_sample_indices is
    bit-equal when driven by the same underlying RandomState stream."""
    from reference_exec import load_ref_tdn_dataset
    from workoutdetector_tpu.data.sampling import tdn_sample_indices

    td = load_ref_tdn_dataset()

    class _LegacyRng:
        """Adapter: our Generator-style .integers on top of the SAME
        legacy RandomState stream np.random.seed drives globally."""

        def __init__(self, seed):
            self.rs = np.random.RandomState(seed)

        def integers(self, low, high=None, size=None):
            return self.rs.randint(low, high, size=size)

    # (total, num_segments, num_frames) covering: average_duration > 0,
    # the sparse sort branch (both sub-arms), and the all-zeros branch
    cases = [(200, 8, 5), (41, 8, 5), (12, 8, 5), (10, 8, 5), (9, 8, 5),
             (8, 8, 5), (5, 8, 5), (3, 8, 5), (64, 16, 5), (7, 4, 5)]
    for seed, (total, ns, nf) in enumerate(cases):
        self_like = types.SimpleNamespace(num_segments=ns, num_frames=nf)
        np.random.seed(seed)  # drives the module-level numpy.random.randint
        ref = td.TDNDataset.sample_indices(self_like, list(range(total)))
        got = tdn_sample_indices(total, num_segments=ns, num_frames=nf,
                                 rng=_LegacyRng(seed))
        np.testing.assert_array_equal(got, ref), (total, ns, nf)


def test_repcount_get_video_list_reference_executable():
    """The reference RepcountDataset.get_video_list EXECUTES over the REAL
    shipped annotation pack (repcount_dataset.py:254-406: per-rep
    half-segments, +1 frame indexing, start→mid/mid+1→end binary labels,
    max_reps truncation) and our data/repcount_datasets.get_video_list
    yields the identical span list. Also documents the reference's
    max_reps<1 latent bug: its docstring promises 'all repetitions', its
    code slices reps[:max_reps*2] unconditionally (0 → nothing, -1 →
    drops the last rep); ours follows the docstring."""
    from workoutdetector_tpu.data.repcount import RepcountHelper
    from workoutdetector_tpu.data.repcount_datasets import get_video_list

    mod = load_ref_repcount_dataset()
    ds = mod.RepcountDataset(root=os.path.join(REF_ROOT, "datasets"),
                             split="train")
    anno = os.path.join(REF_ROOT, "datasets", "RepCount", "annotation.csv")
    # data_root='RepCount' makes our frames_path string-identical to the
    # reference's relative 'RepCount/rawframes/<split>/<stem>' paths
    helper = RepcountHelper("RepCount", anno)

    for split, action in [("val", None), ("val", "squat"),
                          ("test", "pull_up"), ("train", "bench_pressing")]:
        ref = ds.get_video_list(split, action=action, max_reps=2)
        got = get_video_list(helper, split, action=action, max_reps=2)
        assert len(got) == len(ref) > 0, (split, action)
        for r, g in zip(ref, got):
            assert g["video_path"] == r["video_path"]
            assert (g["start"], g["end"], g["length"], g["label"]) == \
                (r["start"], r["end"], r["length"], r["label"])
            assert g["class_"] == r["class"]

    # max_reps=1 truncation parity
    ref1 = ds.get_video_list("val", action="squat", max_reps=1)
    got1 = get_video_list(helper, "val", action="squat", max_reps=1)
    assert [g["start"] for g in got1] == [r["start"] for r in ref1]
    assert len(ref1) < len(ds.get_video_list("val", "squat", max_reps=99))

    # the documented reference bug: max_reps=0 returns NOTHING from the
    # reference despite its docstring; ours returns every rep
    assert ds.get_video_list("val", action="squat", max_reps=0) == []
    all_spans = get_video_list(helper, "val", action="squat", max_reps=0)
    assert len(all_spans) >= len(got1)


@pytest.mark.parametrize("model_type", ["video", "image"])
def test_reference_eval_dataset_exec_parity(tmp_path, capsys, model_type):
    """The reference's eval_dataset EXECUTES end-to-end
    (utils/inference_count.py:424-512: RepcountHelper walk over a
    RepCount-shaped root, per-video count_by_*_model, helper.eval_count,
    MAE/OBO print, per-video CSV) against a synthetic split, with its
    model calls served by OUR engine (video: the inference_video seam
    shims of test_reference_count_by_video_model_exec_parity; image: a
    brightness scorer at the inference_image seam) — and our eval_dataset
    over the same videos returns identical per-video counts, MAE, OBO and
    CSV rows."""
    import re

    import jax
    import jax.numpy as jnp
    import pandas as pd

    from test_infer import SIZE, BrightnessModel, _write_video
    from workoutdetector_tpu.data.transforms import (center_crop,
                                                     resize_short_side)
    from workoutdetector_tpu.infer import InferenceEngine
    from workoutdetector_tpu.infer.inference_count import eval_dataset

    ic = load_ref_inference_count()
    ic.RepcountHelper = load_ref_repcount_dataset().RepcountHelper

    # RepCount-shaped root under a synthetic PROJ_ROOT
    root = tmp_path / "data" / "RepCount"
    (root / "videos" / "val").mkdir(parents=True)
    names, classes, counts, reps = [], [], [], []
    for v, (pattern, cls) in enumerate([
            ([40, 220, 40, 220, 40, 220], "squat"),
            ([220, 40, 220, 40], "squat"),
            ([40, 40, 220, 220, 40, 220], "pull_up")]):
        name = f"ev{v}.mp4"
        _write_video(root / "videos" / "val" / name, pattern,
                     frames_per_state=9)
        names.append(name)
        classes.append(cls)
        counts.append(len(pattern) // 2)
        reps.append(" ".join(str(9 * i) for i in range(len(pattern))))
    pd.DataFrame({
        "name": names, "class_": classes, "split": ["val"] * 3,
        "count": counts, "reps": reps, "vid": names,
        "start": [0] * 3, "end": [0] * 3,
    }).to_csv(root / "annotation.csv")
    ic.PROJ_ROOT = str(tmp_path)
    ic.REPCOUNT_ANNO_PATH = str(root / "annotation.csv")

    model = BrightnessModel()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, SIZE, SIZE, 3)))
    engine = InferenceEngine(model, variables, num_segments=8,
                             window_batch=4, image_size=SIZE)

    if model_type == "video":
        # the two latent-bug shims of the count_by_video_model gate
        def prep_transform(x):
            clip = x.numpy().astype(np.uint8)
            clip = center_crop(resize_short_side(clip, 256), SIZE)
            return torch.from_numpy(clip).float()

        orig_inference_video = ic.inference_video

        def patched_inference_video(m, inputs, threshold=0.5, transform=None):
            pred = orig_inference_video(m, inputs, threshold,
                                        transform or prep_transform)
            return sorted(pred, key=lambda t: -t[1])

        ic.inference_video = patched_inference_video

        class RefModel(ic.onnxruntime.InferenceSession):
            def get_inputs(self):
                return [types.SimpleNamespace(name="input")]

            def run(self, _, feed):
                u8 = feed["input"].astype(np.uint8)
                return [np.asarray(engine.score_windows(u8))]

        ref_model = RefModel()
        our_engine = engine
    else:
        # brightness scorer at the inference_image seam: depends only on
        # the frame mean, so raw-BGR (reference) and prepped-RGB (ours)
        # frames of these uniform videos score identically
        def bright_score(frame_or_clip):
            m = np.asarray(frame_or_clip, dtype=np.float32).mean(
                axis=tuple(range(1, np.asarray(frame_or_clip).ndim))) \
                if np.asarray(frame_or_clip).ndim == 4 else \
                np.asarray(frame_or_clip, dtype=np.float32).mean()
            hot = (np.atleast_1d(m) > 128).astype(np.float32)
            return np.stack([9.0 * (1 - hot), 9.0 * hot], axis=-1)

        ic.inference_image = lambda model, frame, threshold=0.5: \
            bright_score(frame)[0]

        class ImgEngine:
            image_size = SIZE

            def score_images(self, video):
                return bright_score(video)

        ref_model = object()
        our_engine = ImgEngine()

    ref_dir = tmp_path / "ref_out"
    ref_dir.mkdir()
    ic.eval_dataset(ref_model, action=["squat", "pull_up"], split="val",
                    model_type=model_type, output_dir=str(ref_dir),
                    csv_name="ref.csv")
    printed = capsys.readouterr().out
    m = re.search(r"MAE=([\d.]+), OBO_ACC=([\d.]+)", printed)
    assert m, printed
    ref_mae, ref_obo = float(m.group(1)), float(m.group(2))

    our_dir = tmp_path / "our_out"
    mae, obo = eval_dataset(our_engine, action=["squat", "pull_up"],
                            split="val", data_root=str(root),
                            model_type=model_type, output_dir=str(our_dir),
                            csv_name="ours.csv")
    assert (mae, obo) == (ref_mae, ref_obo)

    ref_df = pd.read_csv(ref_dir / "ref.csv", index_col=0).set_index(
        "video_name")
    our_df = pd.read_csv(our_dir / "ours.csv", index_col=0).set_index(
        "video_name")
    assert set(ref_df.index) == set(our_df.index) == set(names)
    for n in names:
        for col in ("pred_count", "count", "mae", "obo_acc", "class_",
                    "split"):
            assert our_df.loc[n, col] == ref_df.loc[n, col], (n, col)
    # non-trivial: at least one video counted > 0
    assert ref_df["pred_count"].max() > 0


def test_frame_and_image_dataset_reference_executable(tmp_path):
    """The reference's OWN FrameDataset/ImageDataset — the rawframe hot
    loop (datasets/common.py:16-170) — execute over a shared rawframe
    tree: annotation parsing (3- AND 4-column), deterministic segment
    sampling (the genuine reference sample_frames wired in) and clip
    assembly match our data.datasets classes pixel-for-pixel (reference
    CHW torch vs our NHWC uint8). Covers the total<num repeat branch."""
    import cv2

    from reference_exec import load_ref_common
    from workoutdetector_tpu.data.datasets import FrameDataset, ImageDataset

    root = tmp_path
    rng = np.random.default_rng(3)
    totals = [40, 6, 12]  # 6 < num_segments exercises the repeat branch
    anno4, anno3 = [], []
    for d, total in enumerate(totals):
        fdir = root / "rawframes" / f"v{d}"
        fdir.mkdir(parents=True)
        for i in range(1, total + 1):
            img = rng.integers(0, 256, size=(24, 32, 3)).astype(np.uint8)
            cv2.imwrite(str(fdir / f"img_{i:05}.jpg"), img)
        anno4.append(f"v{d} 1 {total} {d % 2}")
        anno3.append(f"v{d} {total} {d % 2}")
    (root / "anno4.txt").write_text("\n".join(anno4) + "\n")
    (root / "anno3.txt").write_text("\n".join(anno3) + "\n")

    ref_common = load_ref_common()
    for col, anno in ((4, "anno4.txt"), (3, "anno3.txt")):
        ref_ds = ref_common.FrameDataset(str(root),
                                         anno_path=str(root / anno),
                                         data_prefix="rawframes",
                                         num_segments=8, anno_col=col,
                                         is_test=True)
        ours = FrameDataset(str(root), anno_path=str(root / anno),
                            data_prefix="rawframes", num_segments=8,
                            anno_col=col, is_test=True)
        assert len(ref_ds) == len(ours) == len(totals)
        for i in range(len(totals)):
            ref_clip, ref_label = ref_ds[i]
            our_clip, our_label = ours.__getitem__(i)
            assert int(ref_label) == int(our_label) == i % 2
            np.testing.assert_array_equal(
                ref_clip.numpy().transpose(0, 2, 3, 1), our_clip)

    img_lines = [f"v{d}/img_00001.jpg {d}" for d in range(len(totals))]
    (root / "img.txt").write_text("\n".join(img_lines) + "\n")
    ref_img = ref_common.ImageDataset(str(root), data_prefix="rawframes",
                                      anno_path=str(root / "img.txt"))
    our_img = ImageDataset(str(root), data_prefix="rawframes",
                           anno_path=str(root / "img.txt"))
    assert len(ref_img) == len(our_img) == len(totals)
    for i in range(len(totals)):
        ref_i, ref_l = ref_img[i]
        our_i, our_l = our_img.__getitem__(i)
        assert int(ref_l) == int(our_l) == i
        np.testing.assert_array_equal(
            ref_i.numpy().transpose(1, 2, 0), our_i[0])


def test_relabel_tooling_reference_executable(tmp_path):
    """The reference's OWN relabel tooling executes as the oracle
    (scripts/mpvscreenshot_process.py:11-70): filename→(name, sec)
    parsing agrees on a sweep, name_to_png round-trips identically on
    the sub-hour timestamps where the reference's ``m = sec // 60``
    minute arithmetic is well-defined (≥1 h it emits minutes > 59 — a
    latent reference bug our integer-ms version fixes), and
    screenshots_to_csv over a synthetic screenshot tree is
    byte-identical — including the 0/1/0 triple labeling (the END frame
    is class 0)."""
    from reference_exec import load_ref_mpvscreenshot
    from workoutdetector_tpu.scripts import relabel

    ref = load_ref_mpvscreenshot()
    for s in ("stu2_48.mp4_00_00_09.943.png",
              "train951.mp4_00_01_22.500.png",
              "x_1.mp4_00_59_59.007.png"):
        assert ref.process_screenshot(s) == relabel.process_screenshot(s)
    for vid, sec in (("a.mp4", 9.943), ("b.mp4", 62.5), ("c.mp4", 0.25),
                     ("d.mp4", 3599.007)):
        assert ref.name_to_png(vid, sec) == relabel.name_to_png(vid, sec)

    shots = tmp_path / "shots"
    for split in ("train", "val", "test"):
        d = shots / split
        d.mkdir(parents=True)
        for k in range(6):  # 2 reps x (start, mid, end)
            name = ref.name_to_png(f"{split}{k // 3}.mp4", 1.5 * k + 0.25)
            (d / name).touch()
    ref_csv = tmp_path / "ref.csv"
    our_csv = tmp_path / "ours.csv"
    ref.screenshots_to_csv(str(shots), str(ref_csv))
    relabel.screenshots_to_csv(str(shots), str(our_csv))
    assert ref_csv.read_bytes() == our_csv.read_bytes()


def test_build_workout_reference_executable(tmp_path):
    """The reference's OWN Workouts merge (scripts/build_datasets.py:64-161
    build_workout) executes over a fixture tree using the reference's REAL
    classes.txt packs: all five remapped label lists are byte-identical to
    scripts.build_datasets.build_workout's, including which RepCount
    classes drop (no Workout slot) and the per-source path prefixes."""
    import shutil

    from reference_exec import load_ref_build_datasets
    from workoutdetector_tpu.scripts.build_datasets import build_workout

    proj = tmp_path / "proj"
    rng = np.random.default_rng(0)
    n_classes = {}
    for src in ("RepCount", "Countix"):
        (proj / "datasets" / src).mkdir(parents=True)
        shutil.copy(os.path.join(REF_ROOT, "datasets", src, "classes.txt"),
                    proj / "datasets" / src / "classes.txt")
        n_classes[src] = len([
            ln for ln in
            (proj / "datasets" / src / "classes.txt").read_text().splitlines()
            if ln.strip()])

    def write_lists(src, splits):
        d = proj / "data" / src / "rawframes"
        d.mkdir(parents=True)
        for split in splits:
            rows = [f"{src.lower()}_{split}_{k} "
                    f"{int(rng.integers(30, 300))} {k % n_classes[src]}"
                    for k in range(2 * n_classes[src])]
            (d / f"{split}.txt").write_text("\n".join(rows) + "\n")

    write_lists("RepCount", ("train", "val", "test"))
    write_lists("Countix", ("train", "val"))
    (proj / "data" / "Workout" / "rawframes").mkdir(parents=True)

    ref = load_ref_build_datasets(str(proj))
    ref.build_workout()

    ours_out = tmp_path / "ours_out"
    build_workout(
        data_root=str(proj / "data"),
        repcount_classes_path=str(proj / "datasets/RepCount/classes.txt"),
        countix_classes_path=str(proj / "datasets/Countix/classes.txt"),
        out_root=str(ours_out), symlink=False)

    for name in ("train_repcount.txt", "val_repcount.txt",
                 "test_repcount.txt", "train_countix.txt",
                 "val_countix.txt"):
        ref_bytes = (proj / "data/Workout/rawframes" / name).read_bytes()
        assert ref_bytes, name
        assert ref_bytes == (ours_out / name).read_bytes(), name

    # non-trivial: RepCount classes without a Workout slot must DROP rows
    n_in = len((proj / "data/RepCount/rawframes/train.txt")
               .read_text().splitlines())
    n_out = len((proj / "data/Workout/rawframes/train_repcount.txt")
                .read_text().splitlines())
    assert 0 < n_out < n_in
