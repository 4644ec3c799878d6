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


class LoggerCollection:
    def __init__(self, loggers: List[Any]):
        self.loggers = loggers

    def log_hyperparams(self, params: Dict[str, Any]) -> None:
        for lg in self.loggers:
            lg.log_hyperparams(params)

    def log_metrics(self, metrics: Dict[str, Any], step: int = 0) -> None:
        for lg in self.loggers:
            lg.log_metrics(metrics, step=step)

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
