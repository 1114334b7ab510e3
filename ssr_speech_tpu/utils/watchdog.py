"""Deadlock/stall watchdog.

Capability parity with the reference ``DeadlockDetect``
(``audiocraft/audiocraft/utils/deadlock.py:18-58``): a watchdog thread is fed
stage beacons from the training loop (solvers/base.py:538-554); if no beacon
arrives within the timeout it dumps all python thread stacks and kills the
process so the job scheduler can restart it. Useful on TPU pods where a
wedged collective otherwise hangs forever.
"""

from __future__ import annotations

import faulthandler
import logging
import os
import queue
import signal
import sys
import threading
from typing import Optional

logger = logging.getLogger(__name__)


class DeadlockDetect:
    def __init__(self, use: bool = False, timeout: float = 600.0):
        self.use = use
        self.timeout = timeout
        self._queue: "queue.Queue[str]" = queue.Queue()
        self._thread: Optional[threading.Thread] = None

    def update(self, stage: str):
        if self.use:
            self._queue.put(stage)

    def __enter__(self):
        if self.use:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        return self

    def __exit__(self, *exc):
        if self.use:
            self._queue.put("exit")

    def _loop(self):
        while True:
            try:
                stage = self._queue.get(timeout=self.timeout)
            except queue.Empty:
                logger.error(
                    "deadlock detected: no beacon for %.0fs, dumping stacks "
                    "and aborting", self.timeout,
                )
                faulthandler.dump_traceback(file=sys.stderr, all_threads=True)
                os.kill(os.getpid(), signal.SIGKILL)
            else:
                if stage == "exit":
                    return
