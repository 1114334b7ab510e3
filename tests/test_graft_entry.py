"""Driver-contract regression tests for __graft_entry__.

Round-1 verdict: the driver's multichip dryrun failed because the axon TPU
plugin overrides the platform env vars and ``dryrun_multichip`` did not force
the virtual-CPU platform itself. These tests run the entry point exactly the
way the driver does — a fresh python process with NO special env — and must
stay green.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "_SSR_DRYRUN_SUBPROCESS")}
    return env


@pytest.mark.slow
def test_dryrun_multichip_clean_subprocess():
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multichip ok: n=8" in proc.stdout, proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_after_backend_init():
    # Simulates the driver initializing JAX (e.g. for entry()) before the
    # dryrun: the function must detect the dead backend and re-exec.
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); jax.devices();"
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multichip ok: n=8" in proc.stdout, proc.stdout
