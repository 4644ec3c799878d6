"""Orbax checkpointing: best-by-val-acc + last + resume.

TPU-native replacement for Lightning ModelCheckpoint + the reference's
manual torch checkpoint key surgery (SURVEY §5 checkpoint/resume;
reference trainer.py:230-243, models/tsm.py:451-473 — the torch-side
surgery lives in models/convert.py).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper with named checkpoints ('best', 'last', ...)."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state: Any, name: str = "last",
             meta: Optional[Dict[str, Any]] = None) -> str:
        path = self._path(name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        if meta is not None:
            with open(path + ".meta.json", "w") as f:
                json.dump(meta, f, default=str)
        return path

    def restore(self, path_or_name: str, target: Any) -> Tuple[Any, Dict[str, Any]]:
        """Restore into the structure of ``target``. Accepts a bare name
        ('best') or a full path."""
        path = path_or_name if os.path.isabs(path_or_name) or os.path.sep in \
            path_or_name else self._path(path_or_name)
        path = os.path.abspath(path)
        restored = self._ckptr.restore(path, target)
        meta: Dict[str, Any] = {}
        meta_path = path + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return restored, meta

    def restore_variables(self, path_or_name: str,
                          prefer_ema: bool = True) -> Dict[str, Any]:
        """Target-free restore of just the model variables.

        Reads the raw checkpoint tree (no structure needed) and returns
        {'params', 'batch_stats'} — what serving/eval need without knowing
        the optimizer-state layout the trainer saved. When the run trained
        with EMA (optimizer.ema_decay > 0) the checkpoint carries
        'ema_params'; ``prefer_ema`` ships those as 'params' — the
        averaged weights are the deployment weights. The trainer's resume
        fallback passes ``prefer_ema=False`` to keep training the raw ones.
        """
        path = path_or_name if os.path.isabs(path_or_name) or os.path.sep in \
            path_or_name else self._path(path_or_name)
        raw = self._ckptr.restore(os.path.abspath(path))
        params = raw.get("params", raw)
        if prefer_ema and isinstance(raw, dict) and \
                raw.get("ema_params") is not None:
            params = raw["ema_params"]
        out = {"params": params}
        if "batch_stats" in raw:
            out["batch_stats"] = raw["batch_stats"]
        return out

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))
