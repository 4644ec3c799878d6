"""Metric loggers: CSV + TensorBoard(+X) + optional W&B.

Mirrors the reference's triple-logger setup (trainer.py:256-295: WandB,
TensorBoard, CSV) with graceful degradation — each backend is optional and
failures never take down training.
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Any, Dict, List, Optional


class CSVLogger:
    def __init__(self, save_dir: str, name: str = "csv"):
        self.dir = os.path.join(save_dir, name)
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "metrics.csv")
        self._fields: List[str] = ["step"]
        self._rows: List[Dict[str, Any]] = []

    def log_hyperparams(self, params: Dict[str, Any]) -> None:
        with open(os.path.join(self.dir, "hparams.json"), "w") as f:
            json.dump(params, f, indent=2, default=str)

    def log_histograms(self, hists: Dict[str, Any], step: int = 0,
                       labels: Optional[List[str]] = None) -> None:
        """CSV has no histogram type: log schema-stable summary scalars
        (mean/max) plus the argmax leaf's label when one is supplied —
        enough to spot an exploding layer from the csv alone."""
        del_labels = labels or []
        row: Dict[str, Any] = {}
        for tag, values in hists.items():
            import numpy as _np
            v = _np.asarray(values)
            row[f"{tag}/mean"] = float(v.mean()) if v.size else 0.0
            row[f"{tag}/max"] = float(v.max()) if v.size else 0.0
            if del_labels and v.size == len(del_labels):
                row[f"{tag}/argmax_leaf"] = del_labels[int(v.argmax())]
        self.log_metrics(row, step=step)

    def log_metrics(self, metrics: Dict[str, Any], step: int = 0) -> None:
        row = {"step": step, **metrics}
        new_fields = [k for k in row if k not in self._fields]
        self._rows.append(row)
        if new_fields or not os.path.exists(self.path):
            # schema grew (e.g. first val/ row): rewrite once with the
            # extended header
            self._fields.extend(new_fields)
            with open(self.path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._fields)
                w.writeheader()
                w.writerows(self._rows)
        else:
            # steady state: append only the new row — a long run must not
            # rewrite an ever-growing file on every log call
            with open(self.path, "a", newline="") as f:
                csv.DictWriter(f, fieldnames=self._fields).writerow(row)


class TensorBoardLogger:
    def __init__(self, save_dir: str, name: str = "tensorboard"):
        self.writer = None
        try:
            from tensorboardX import SummaryWriter
            self.writer = SummaryWriter(os.path.join(save_dir, name))
        except Exception:
            pass

    def log_hyperparams(self, params: Dict[str, Any]) -> None:
        if self.writer is not None:
            self.writer.add_text("hparams", json.dumps(params, default=str))

    def log_metrics(self, metrics: Dict[str, Any], step: int = 0) -> None:
        if self.writer is None:
            return
        for k, v in metrics.items():
            try:
                self.writer.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def log_histograms(self, hists: Dict[str, Any], step: int = 0,
                       labels: Optional[List[str]] = None) -> None:
        del labels  # TB histograms are unlabeled distributions
        if self.writer is None:
            return
        for tag, values in hists.items():
            try:
                self.writer.add_histogram(tag, values, step)
            except Exception:
                pass

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()


class WandbLogger:
    """Gated: wandb is not in the image; becomes a no-op when missing."""

    def __init__(self, save_dir: str, project: str, name: Optional[str],
                 offline: bool = True):
        self.run = None
        try:
            import wandb
            mode = "offline" if offline else "online"
            self.run = wandb.init(project=project, name=name, dir=save_dir, mode=mode)
        except Exception:
            pass

    def log_hyperparams(self, params: Dict[str, Any]) -> None:
        if self.run is not None:
            self.run.config.update(params, allow_val_change=True)

    def log_metrics(self, metrics: Dict[str, Any], step: int = 0) -> None:
        if self.run is not None:
            self.run.log(metrics, step=step)

    def log_histograms(self, hists: Dict[str, Any], step: int = 0,
                       labels: Optional[List[str]] = None) -> None:
        del labels
        if self.run is None:
            return
        try:
            import wandb
            self.run.log({k: wandb.Histogram(v) for k, v in hists.items()},
                         step=step)
        except Exception:
            pass


class LoggerCollection:
    def __init__(self, loggers: List[Any]):
        self.loggers = loggers

    def log_hyperparams(self, params: Dict[str, Any]) -> None:
        for lg in self.loggers:
            lg.log_hyperparams(params)

    def log_metrics(self, metrics: Dict[str, Any], step: int = 0) -> None:
        for lg in self.loggers:
            lg.log_metrics(metrics, step=step)

    def log_histograms(self, hists: Dict[str, Any], step: int = 0,
                       labels: Optional[List[str]] = None) -> None:
        """Gradient/param watching (reference wandb.watch,
        trainer.py:266): values are 1-D arrays (e.g. per-leaf norms);
        each backend renders them its own way (TB/W&B histograms, CSV
        mean/max summaries)."""
        for lg in self.loggers:
            if hasattr(lg, "log_histograms"):
                lg.log_histograms(hists, step=step, labels=labels)

    def close(self) -> None:
        for lg in self.loggers:
            if hasattr(lg, "close"):
                lg.close()


def build_loggers(cfg, log_dir: str) -> LoggerCollection:
    loggers: List[Any] = []
    if cfg.log.csv_enable:
        loggers.append(CSVLogger(log_dir))
    if cfg.log.tensorboard_enable:
        loggers.append(TensorBoardLogger(log_dir))
    if cfg.log.wandb.enable:
        loggers.append(
            WandbLogger(log_dir, cfg.log.wandb.project, cfg.log.wandb.name,
                        cfg.log.wandb.offline))
    return LoggerCollection(loggers)
