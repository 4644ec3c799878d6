"""Kinetics-400-scale smoke (VERDICT r4 #8).

The 400-class config exists (configs/kinetics400_tsm.yaml) but nothing
had ever compiled/trained/scored at 400 classes — the fc and the
consensus get 33x wider than the 12-class RepCount heads. Here a
synthetic rawframe corpus with labels spanning the full [0, 400) range
drives the whole width-400 path: FrameDataset batches -> the jitted
sharded train step (loss finite, logits (B, 400)) -> InferenceEngine
scoring -> the wd-eval scoring CLI writing 400-entry score JSONs that
eval_score_dir reads back. Reference parity bar: the reference consumes
k400 TSM checkpoints through exactly these widths
(tests/test_models.py:86-114, configs/tsm_action_recogition_sthv2.py).
"""

import json
import os
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from workoutdetector_tpu.config import Config

SIZE = 32
T = 4
NUM_CLASS = 400


def _cfg() -> Config:
    cfg = Config()
    cfg.model.model_type = "tsm"
    cfg.model.base_model = "resnet18"
    cfg.model.num_class = NUM_CLASS
    cfg.model.num_segments = T
    cfg.model.dropout = 0.0
    cfg.model.dtype = "float32"
    cfg.data.image_size = SIZE
    cfg.data.num_segments = T
    cfg.optimizer.lr = 0.01
    return cfg


@pytest.fixture(scope="module")
def rawframes(tmp_path_factory):
    """8 rawframe videos whose labels cover both ends of [0, 400)."""
    root = tmp_path_factory.mktemp("k400")
    labels = [0, 7, 99, 200, 311, 398, 399, 399]
    for vi, lab in enumerate(labels):
        d = root / "rawframes" / f"v{vi}"
        d.mkdir(parents=True)
        for i in range(1, T * 2 + 1):
            cv2.imwrite(str(d / f"img_{i:05}.jpg"),
                        np.full((SIZE, SIZE, 3), (37 * vi) % 256, np.uint8))
    anno = root / "train.txt"
    # 3-column k400 layout: dir total label (anno_col=3, the config's)
    anno.write_text("".join(
        f"v{vi} {T * 2} {lab}\n" for vi, lab in enumerate(labels)))
    return str(root), str(anno), labels


def test_train_step_at_400_classes(rawframes):
    from workoutdetector_tpu.data.datasets import FrameDataset
    from workoutdetector_tpu.parallel.mesh import shard_batch
    from workoutdetector_tpu.train.trainer import Trainer

    root, anno, labels = rawframes
    ds = FrameDataset(root, anno, data_prefix="rawframes",
                      num_segments=T, anno_col=3)
    assert len(ds) == len(labels)
    rng = np.random.default_rng(0)
    clips, ys = zip(*(ds.__getitem__(i, rng) for i in range(len(ds))))
    x = np.stack(clips)
    y = np.asarray(ys, np.int32)
    assert y.max() == 399 and x.shape == (8, T, SIZE, SIZE, 3)

    trainer = Trainer(_cfg())
    state = trainer.init_state(steps_per_epoch=2, image_size=SIZE)
    step = trainer.train_step_fn()
    state, metrics = step(state, *shard_batch((x, y), trainer.mesh))
    assert np.isfinite(float(metrics["loss"]))
    ev = trainer.eval_step_fn()(state, *shard_batch((x, y), trainer.mesh))
    assert int(ev["total"]) == 8

    # the logits really are 400-wide through the jitted step
    logits = trainer.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        (x[:2] / 255.0).astype(np.float32) * 2 - 1, train=False)
    assert logits.shape == (2, NUM_CLASS)


def test_engine_and_wd_eval_at_400_classes(tmp_path):
    """A 400-class engine scores a RepCount-layout corpus through the
    real wd-eval CLI: score JSONs carry 400-entry score dicts per
    window, eval_score_dir reads them back, and --eval counts."""
    from workoutdetector_tpu import counting
    from workoutdetector_tpu.data.synthetic import build_repcount_corpus
    from workoutdetector_tpu.infer.engine import InferenceEngine
    from workoutdetector_tpu.infer.inference_count import main as wd_eval
    from workoutdetector_tpu.train.checkpoint import CheckpointManager
    from workoutdetector_tpu.train.trainer import Trainer

    root = str(tmp_path / "corpus")
    df = build_repcount_corpus(root, n_videos=4, size=SIZE, seed=5,
                               splits=(("val", 1.0),), zero_count_frac=0.0)
    val = sorted(df["name"])

    cfg = _cfg()
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=2, image_size=SIZE)
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(state, name="last")
    mgr.wait_until_finished()

    eng = InferenceEngine(trainer.model,
                          {"params": state.params,
                           "batch_stats": state.batch_stats},
                          num_segments=T, window_batch=4, image_size=SIZE)
    w = np.zeros((3, T, SIZE, SIZE, 3), np.uint8)
    assert eng.score_windows(w).shape == (3, NUM_CLASS)

    score_dir = str(tmp_path / "scores")
    overrides = ["model.model_type=tsm", "model.base_model=resnet18",
                 f"model.num_class={NUM_CLASS}", f"model.num_segments={T}",
                 "model.dropout=0.0", "model.dtype=float32",
                 f"data.image_size={SIZE}", f"data.num_segments={T}"]
    wd_eval(["--score", score_dir, "--split", "val",
             "--checkpoint", osp.join(ckpt_dir, "last"),
             "--data-root", root, "--on-error", "raise"] + overrides)
    files = sorted(f for f in os.listdir(score_dir)
                   if f.endswith(".score.json"))
    assert files == [f"{n}.score.json" for n in val]
    data = json.load(open(osp.join(score_dir, files[0])))
    first_window = next(iter(data["scores"].values()))
    assert len(first_window) == NUM_CLASS

    mae, obo, rows = counting.eval_score_dir(
        score_dir, osp.join(root, "annotation.csv"), softmax=True)
    assert len(rows) == len(val)
    assert np.isfinite(mae)

    wd_eval(["--eval", "--split", "val",
             "--checkpoint", osp.join(ckpt_dir, "last"),
             "--data-root", root, "--on-error", "raise",
             "--counts-out", str(tmp_path / "counts.json")] + overrides)
    counts = json.load(open(str(tmp_path / "counts.json")))
    assert set(counts) == set(val)
