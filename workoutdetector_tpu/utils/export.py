"""Model export — the ONNX replacement.

The reference deploys via torch.onnx export (scripts/export_model.py:35-64,
trainer.py:325-330) and serves the .onnx through onnxruntime. TPU-native
equivalent (SURVEY §2.9): serialize the jitted inference graph with
``jax.export`` (StableHLO + calling convention), weights baked in, to a
single ``.jaxm`` artifact with a JSON sidecar describing shapes/classes.
The artifact replays on any machine with jax — no framework code needed.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from workoutdetector_tpu.ops.preprocess import normalize_clip


def make_inference_fn(model: Any, variables: Dict[str, Any]) -> Callable:
    """Deployment graph: uint8 windows → logits, weights closed over.

    Inference-only exact rewrites are applied before serialization (same
    set as InferenceEngine: TimeSformer t_fc→proj fold, −3.7% device
    time / −6% artifact size; no-op for other families)."""
    from workoutdetector_tpu.models.timesformer import fold_for_inference
    model, variables = fold_for_inference(model, dict(variables))

    from workoutdetector_tpu.models.repnet import RepNet
    if isinstance(model, RepNet):
        # the period family deploys its PER-FRAME logits (B, T, C) —
        # counting (infer.count_by_repnet) needs them, and the consensus
        # is just their frame mean, so nothing is lost
        def frame_fn(x_u8: jnp.ndarray) -> jnp.ndarray:
            _, inter = model.apply(variables, normalize_clip(x_u8),
                                   train=False, mutable=["intermediates"])
            return inter["intermediates"]["aux_logits"][0]

        return frame_fn

    def fn(x_u8: jnp.ndarray) -> jnp.ndarray:
        return model.apply(variables, normalize_clip(x_u8), train=False)

    return fn


def export_model(model: Any,
                 variables: Dict[str, Any],
                 path: str,
                 input_shape: Sequence[int] = (1, 8, 224, 224, 3),
                 input_dtype: Any = jnp.uint8,
                 labels: Optional[Sequence[str]] = None,
                 platforms: Optional[Sequence[str]] = None,
                 meta: Optional[Dict[str, Any]] = None) -> str:
    """Serialize the full inference graph to ``path`` (.jaxm appended).

    Counterpart of reference export (`(1, 8, 3, 224, 224)` opset-11 onnx,
    trainer.py:325-330) — shape convention here is NHWC uint8.
    """
    fn = make_inference_fn(model, variables)
    spec = jax.ShapeDtypeStruct(tuple(input_shape), input_dtype)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax_export.export(jax.jit(fn), **kwargs)(spec)
    blob = exported.serialize()
    if not path.endswith(".jaxm"):
        path += ".jaxm"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    sidecar = {
        "input_shape": list(input_shape),
        "input_dtype": str(jnp.dtype(input_dtype)),
        "platforms": list(exported.platforms),
        "labels": list(labels) if labels else None,
    }
    if meta:
        sidecar.update(meta)
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f, indent=2)
    return path


class ExportedModel:
    """Loaded artifact: callable like the original inference fn."""

    def __init__(self, exported, meta: Dict[str, Any]):
        self._exported = exported
        self.meta = meta

    def __call__(self, x) -> jnp.ndarray:
        return self._exported.call(x)

    @property
    def input_shape(self) -> Tuple[int, ...]:
        return tuple(self.meta.get("input_shape", ()))


def load_exported(path: str) -> ExportedModel:
    if not path.endswith(".jaxm"):
        path += ".jaxm"
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    meta: Dict[str, Any] = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return ExportedModel(exported, meta)
