"""CLI smoke of tools/eval_quality.py: manifest in -> JSON report out
(WER/CER from provided transcripts + SI-SNR; the gated whisper/speaker/
visqol paths stay off)."""

import importlib.util
import json
import os

import numpy as np

from ssr_speech_tpu.utils import audio as audio_io


def _load_cli():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "eval_quality.py")
    spec = importlib.util.spec_from_file_location("eval_quality_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_eval_quality_cli(tmp_path, capsys):
    rng = np.random.default_rng(0)
    sr = 16000
    rows = []
    for i in range(2):
        ref = (rng.normal(size=(sr,)) * 0.1).astype(np.float32)
        gen = ref + rng.normal(size=(sr,)).astype(np.float32) * 0.01
        rp, gp = str(tmp_path / f"r{i}.wav"), str(tmp_path / f"g{i}.wav")
        audio_io.write_wav(rp, ref[None, :], sr)
        audio_io.write_wav(gp, gen[None, :], sr)
        rows.append({"ref": rp, "gen": gp,
                     "text": "hello world", "hyp": "hello word"})
    manifest = tmp_path / "pairs.jsonl"
    manifest.write_text("\n".join(json.dumps(r) for r in rows))
    out = str(tmp_path / "report.json")

    _load_cli().main(["--pairs", str(manifest), "--out", out])

    report = json.loads(open(out).read())
    assert report["n"] == 2
    # near-identical signals: strongly positive SI-SNR
    assert report["si_snr_db"] > 10
    # 1 substitution in 2 words, both rows
    assert abs(report["wer"] - 0.5) < 1e-6
    printed = json.loads(capsys.readouterr().out)
    assert printed == report
