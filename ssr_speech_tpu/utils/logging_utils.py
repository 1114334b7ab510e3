"""Metrics logging: JSONL scalar writer with optional TensorBoard export.

Replaces the reference's TensorBoard usage (``steps/trainer.py:81-138``
``writer.add_scalar`` calls and flashy's result logger,
``solvers/base.py:51-54``). Scalars stream to ``metrics.jsonl`` (one JSON
object per step — greppable, plottable, no heavyweight deps); when
``tensorboardX``/``torch.utils.tensorboard`` happens to be available the same
scalars mirror there.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class MetricsWriter:
    def __init__(self, logdir: str, filename: str = "metrics.jsonl"):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, filename)
        self._f = open(self.path, "a", buffering=1)
        self._tb = None
        try:  # optional mirror
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir)
        except Exception:
            pass

    def add_scalars(self, step: int, scalars: Dict[str, float],
                    prefix: str = ""):
        row = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            key = f"{prefix}{k}" if prefix else k
            row[key] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(key, float(v), step)
        self._f.write(json.dumps(row) + "\n")

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
