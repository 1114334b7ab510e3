"""DeadlockDetect + Profiler: unit behavior and their wiring into the
training loops (reference deadlock.py:18-58, solvers/base.py:536-554)."""

import os
import threading
import time

from ssr_speech_tpu.utils import profiler as prof_mod
from ssr_speech_tpu.utils import watchdog as wd_mod


def test_watchdog_fires_without_beacons(monkeypatch):
    killed = threading.Event()
    monkeypatch.setattr(wd_mod.os, "kill",
                        lambda pid, sig: killed.set())
    wd = wd_mod.DeadlockDetect(use=True, timeout=0.15)
    with wd:
        assert killed.wait(timeout=3.0), "watchdog never fired"
    # after exit the watcher thread must terminate
    wd._thread.join(timeout=2.0)
    assert not wd._thread.is_alive()


def test_watchdog_beacons_prevent_firing(monkeypatch):
    killed = threading.Event()
    monkeypatch.setattr(wd_mod.os, "kill",
                        lambda pid, sig: killed.set())
    wd = wd_mod.DeadlockDetect(use=True, timeout=0.4)
    with wd:
        for _ in range(5):
            time.sleep(0.1)
            wd.update("step")
    wd._thread.join(timeout=2.0)
    assert not killed.is_set()


def test_watchdog_grace_extends_one_gap(monkeypatch):
    """update(..., next_timeout=G) grants the NEXT gap G seconds (first
    compiles / checkpoint pulls), then the base timeout resumes."""
    killed = threading.Event()
    monkeypatch.setattr(wd_mod.os, "kill", lambda pid, sig: killed.set())
    wd = wd_mod.DeadlockDetect(use=True, timeout=0.3)
    with wd:
        wd.update("dispatch", next_timeout=30.0)
        time.sleep(1.0)  # > timeout but << grace: must NOT fire
        assert not killed.is_set()
        wd.update("step")  # grace consumed; base timeout resumes
        assert killed.wait(timeout=10.0), "base timeout did not resume"


def test_watchdog_disabled_is_inert():
    wd = wd_mod.DeadlockDetect(use=False, timeout=0.01)
    with wd:
        wd.update("step")
    assert wd._thread is None


def test_profiler_traces_first_n_steps(tmp_path):
    logdir = str(tmp_path / "profile")
    p = prof_mod.Profiler(logdir=logdir, enabled=True, num_steps=2)
    for _ in range(4):
        p.step()
    p.close()
    assert not p._active
    # jax.profiler writes a plugins/profile/<run>/ tree
    found = [os.path.join(r, f) for r, _, fs in os.walk(logdir) for f in fs]
    assert found, "no trace files written"


def test_profiler_disabled_writes_nothing(tmp_path):
    logdir = str(tmp_path / "off")
    p = prof_mod.Profiler(logdir=logdir, enabled=False, num_steps=2)
    p.step()
    p.close()
    assert not os.path.isdir(logdir)


def test_step_timer():
    t = prof_mod.StepTimer()
    time.sleep(0.02)
    t.data_done()
    time.sleep(0.02)
    t.step_done()
    assert t.data_time > 0 and t.train_time > 0
