"""Experiment logging: dirs, file+stdout logger, JSONL metric stream.

Reference behavior (SURVEY.md §5): experiment-dir creation and python
``logging`` to ``experiment/logs/*.txt`` + stdout. Added for the rebuild:
a structured per-step JSONL metrics stream (machine-readable observability).
"""

import json
import logging
import os
import sys
import time
from typing import Optional


def make_experiment_dir(base: str, name: str) -> str:
    ts = time.strftime("%Y%m%d-%H%M%S")
    path = os.path.join(base, f"{name}-{ts}")
    os.makedirs(os.path.join(path, "logs"), exist_ok=True)
    os.makedirs(os.path.join(path, "checkpoints"), exist_ok=True)
    return path


def get_logger(name: str, log_dir: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_dir:
        fh = logging.FileHandler(os.path.join(log_dir, f"{name}.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class MetricWriter:
    """Structured metrics: one JSON object per record to metrics.jsonl,
    optionally mirrored to TensorBoard (SURVEY.md §5).

    TensorBoard mirroring is OPT-IN: tensorboardX's event writer forks a
    multiprocessing worker, which aborts the process when the JAX runtime
    is already initialized (observed intermittently under pytest)."""

    def __init__(self, log_dir: str, tensorboard: bool = False):
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self._tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except Exception:
                self._tb = None

    def write(self, record: dict):
        rec = {
            k: (float(v) if hasattr(v, "item") else v)
            for k, v in record.items()
        }
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            step = int(rec.get("epoch", rec.get("step", 0)))
            for k, v in rec.items():
                if isinstance(v, (int, float)) and k not in ("epoch", "step"):
                    self._tb.add_scalar(k, v, step)

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
