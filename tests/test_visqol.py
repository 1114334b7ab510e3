"""ViSQOL external-binary hook, driven with a stub executable.

The real google/visqol binary is not in this image (it is optional in the
reference too, ``audiocraft/audiocraft/metrics/visqol.py:22``); the stub
checks the full protocol: install-dir layout, batch_input_csv flag surface,
speech-mode flag, and results-CSV parsing.
"""

import csv
import os
import stat
import wave

import numpy as np
import pytest

from ssr_speech_tpu.utils.visqol import ViSQOL

STUB = r"""#!/usr/bin/env python3
import csv, sys, wave
args = dict(zip(sys.argv[1::2], sys.argv[2::2]))
assert "--use_speech_mode" in sys.argv
inp = args["--batch_input_csv"]; out = args["--results_csv"]
rows = list(csv.DictReader(open(inp)))
with open(out, "w", newline="") as f:
    w = csv.writer(f); w.writerow(["reference", "degraded", "moslqo"])
    for r in rows:
        with wave.open(r["reference"]) as wf:
            assert wf.getframerate() == 16000 and wf.getnchannels() == 1
        w.writerow([r["reference"], r["degraded"], "4.25"])
"""


@pytest.fixture()
def stub_install(tmp_path):
    (tmp_path / "bazel-bin").mkdir()
    (tmp_path / "model").mkdir()
    exe = tmp_path / "bazel-bin" / "visqol"
    exe.write_text(STUB)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    return tmp_path


def test_visqol_hook(stub_install):
    v = ViSQOL(stub_install, mode="speech")
    rng = np.random.default_rng(0)
    ref = [rng.standard_normal(16000) * 0.1 for _ in range(3)]
    deg = [r + rng.standard_normal(16000) * 0.01 for r in ref]
    score = v(ref, deg, sr=16000)
    assert score == pytest.approx(4.25)
    # resampling path: feed 8 kHz input
    score = v([r[:8000] for r in ref], [d[:8000] for d in deg], sr=8000,
              pad_with_silence=True)
    assert score == pytest.approx(4.25)


def test_visqol_missing_binary(tmp_path):
    with pytest.raises(FileNotFoundError):
        ViSQOL(tmp_path / "nope")


def test_visqol_pair_mismatch(stub_install):
    v = ViSQOL(stub_install, mode="speech")
    with pytest.raises(ValueError):
        v([np.zeros(16000)], [], sr=16000)
