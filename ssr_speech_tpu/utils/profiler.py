"""Profiling hooks.

Replaces the reference's xformers profiler wrapper
(``audiocraft/audiocraft/utils/profiler.py:17-38``, enabled via
``cfg.profiler`` and wrapping the first ~20 updates of the epoch loop,
solvers/base.py:536-549) with ``jax.profiler`` traces, plus the wall-clock
step meters of the LM trainer (steps/trainer.py:164-168).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

logger = logging.getLogger(__name__)


class Profiler:
    """Trace the first N steps of a loop to a TensorBoard-compatible dir."""

    def __init__(self, logdir: str = "/tmp/ssr_tpu_profile", enabled: bool = False,
                 num_steps: int = 20):
        self.logdir = logdir
        self.enabled = enabled
        self.num_steps = num_steps
        self._step = 0
        self._active = False

    def step(self):
        """Call once per training step; starts/stops the trace window."""
        import jax

        if not self.enabled:
            return
        if self._step == 0:
            jax.profiler.start_trace(self.logdir)
            self._active = True
            logger.info("profiler: tracing %d steps to %s", self.num_steps,
                        self.logdir)
        self._step += 1
        if self._active and self._step >= self.num_steps:
            jax.profiler.stop_trace()
            self._active = False
            logger.info("profiler: trace written to %s", self.logdir)

    def close(self):
        import jax

        if self._active:
            jax.profiler.stop_trace()
            self._active = False


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """data_time / train_time meters (reference steps/trainer.py:164-168)."""

    def __init__(self):
        self.data_time = 0.0
        self.train_time = 0.0
        self._mark = time.time()

    def data_done(self):
        now = time.time()
        self.data_time = now - self._mark
        self._mark = now

    def step_done(self):
        now = time.time()
        self.train_time = now - self._mark
        self._mark = now
