"""Orbax checkpointing: best-by-val-acc + last + resume, async saves.

TPU-native replacement for Lightning ModelCheckpoint + the reference's
manual torch checkpoint key surgery (SURVEY §5 checkpoint/resume;
reference trainer.py:230-243, models/tsm.py:451-473 — the torch-side
surgery lives in models/convert.py).

Saves are ASYNCHRONOUS by default (orbax AsyncCheckpointer): ``save``
returns once the state is staged to host memory and the serialization/IO
runs on a background thread, so a mid-training 'best' save does not stall
the device step loop — the standard TPU practice the reference's
torch.save has no analog of. Durability points (``restore``, a subsequent
``save``, ``wait_until_finished`` before process exit) synchronize with
any in-flight write.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper with named checkpoints ('best', 'last', ...)."""

    def __init__(self, directory: str, async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # async saver + sync restorer: restores don't benefit from the
        # background thread, and StandardCheckpointer keeps the
        # target-free restore path (restore_variables) simple
        self._saver = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler()) \
            if async_save else ocp.StandardCheckpointer()
        self._restorer = ocp.StandardCheckpointer()
        # meta written for an in-flight async save: (tmp_path, final_path),
        # renamed into place only once the checkpoint itself is durable —
        # meta must never point at a checkpoint that isn't on disk yet
        self._pending_meta: Optional[Tuple[str, str]] = None

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state: Any, name: str = "last",
             meta: Optional[Dict[str, Any]] = None) -> str:
        path = self._path(name)
        # serialize with any in-flight save (orbax forbids overlap); the
        # wait is a no-op when the previous write already finished
        self.wait_until_finished()
        self._saver.save(path, args=ocp.args.StandardSave(state), force=True)
        if meta is not None:
            # stage the meta; it becomes visible (renamed) only at the
            # next durability point, so a crash while the async write is
            # in flight never leaves a meta pointing at a missing ckpt
            tmp = path + ".meta.json.tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f, default=str)
            self._pending_meta = (tmp, path + ".meta.json")
        return path

    def wait_until_finished(self) -> None:
        """Block until any in-flight async save (and its meta) is durable
        on disk. Call before process exit (the trainer does after its
        final 'last' save — a preemption save must not race the
        interpreter dying)."""
        self._saver.wait_until_finished()
        if self._pending_meta is not None:
            tmp, final = self._pending_meta
            os.replace(tmp, final)
            self._pending_meta = None

    def _resolve(self, path_or_name: str) -> str:
        path = path_or_name if os.path.isabs(path_or_name) or os.path.sep in \
            path_or_name else self._path(path_or_name)
        return os.path.abspath(path)

    def restore(self, path_or_name: str, target: Any) -> Tuple[Any, Dict[str, Any]]:
        """Restore into the structure of ``target``. Accepts a bare name
        ('best') or a full path."""
        self.wait_until_finished()  # read-after-write consistency
        path = self._resolve(path_or_name)
        restored = self._restorer.restore(path, target)
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
        self.wait_until_finished()
        raw = self._restorer.restore(self._resolve(path_or_name))
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
