"""Classifier sweep: per-class accuracy of the state classifier over
FrameDataset splits.

Capability match of reference scripts/eval_classification.py:13-57
(onnxruntime sweep → per-class acc JSON), on the compiled engine with
batched device steps.
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict
from typing import Dict

import numpy as np

from workoutdetector_tpu.config import load_config
from workoutdetector_tpu.data.datasets import build_dataset
from workoutdetector_tpu.data.loader import DataLoader
from workoutdetector_tpu.infer.engine import InferenceEngine


def evaluate_split(engine: InferenceEngine, dataset, batch_size: int = 16,
                   num_workers: int = 4) -> Dict[str, float]:
    """Per-class and overall accuracy of the engine over a dataset."""
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                        num_workers=num_workers)
    correct: Dict[int, int] = defaultdict(int)
    total: Dict[int, int] = defaultdict(int)
    for x, y in loader:
        logits = engine.score_windows(x)
        preds = np.argmax(logits, axis=1)
        for p, t in zip(preds, y):
            total[int(t)] += 1
            correct[int(t)] += int(p == t)
    out = {f"class_{k}": correct[k] / total[k] for k in sorted(total)}
    n = sum(total.values())
    out["overall"] = sum(correct.values()) / n if n else 0.0
    return out


def main(argv=None) -> None:
    import jax

    from workoutdetector_tpu.models.factory import build_model, example_input

    parser = argparse.ArgumentParser(description="Evaluate state classifier")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--checkpoint", default=None, help="orbax ckpt")
    parser.add_argument("--splits", nargs="+", default=["val", "test"])
    parser.add_argument("-o", "--out-json", default=None)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("opts", nargs="*")
    args = parser.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cfg = load_config(args.cfg, args.opts)
    model = build_model(cfg.model)
    variables = model.init({"params": jax.random.PRNGKey(cfg.seed)},
                           example_input(cfg.model), train=False)
    if args.checkpoint:
        import os
        from workoutdetector_tpu.train.checkpoint import CheckpointManager
        mgr = CheckpointManager(os.path.dirname(args.checkpoint) or ".")
        restored = mgr.restore_variables(args.checkpoint)
        variables = {"params": restored["params"],
                     "batch_stats": restored.get(
                         "batch_stats", variables.get("batch_stats", {}))}
    engine = InferenceEngine(model, variables,
                             num_segments=cfg.model.num_segments,
                             window_batch=cfg.data.batch_size)
    results = {}
    for split in args.splits:
        ds = build_dataset(cfg.data, split)
        results[split] = evaluate_split(engine, ds, cfg.data.batch_size,
                                        cfg.data.num_workers)
        print(split, results[split])
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
