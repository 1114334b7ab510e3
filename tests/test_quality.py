"""Quality-eval harness: WER/CER math, normalization, report assembly."""

import json

import numpy as np
import pytest

from ssr_speech_tpu.utils import quality


def test_wer_exact_match():
    assert quality.wer("hello world", "hello world") == 0.0


def test_wer_counts_sub_ins_del():
    # 1 sub + 1 del over 4 ref words = 0.5
    assert quality.wer("a b c d", "a x c") == pytest.approx(0.5)
    # insertion: 1 error over 2 ref words
    assert quality.wer("a b", "a x b") == pytest.approx(0.5)


def test_wer_normalization_matches_frontend():
    # digits->words + case + punctuation must NOT count as errors
    assert quality.wer("I have 42 apples!", "i have forty-two apples") == 0.0


def test_wer_zh_char_level():
    assert quality.wer("今天天气", "今天天气", language="zh") == 0.0
    assert quality.wer("今天天气", "今天天好", language="zh") == pytest.approx(0.25)


def test_cer():
    assert quality.cer("abcd", "abxd") == pytest.approx(0.25)


def test_evaluate_pairs_reports_sisnr_and_skips():
    rng = np.random.default_rng(0)
    ref = rng.normal(size=16000).astype(np.float32) * 0.1
    gen = ref + rng.normal(size=16000).astype(np.float32) * 0.001
    report = quality.evaluate_pairs([(ref, gen)], sr=16000)
    assert report["n"] == 1
    assert report["si_snr_db"] > 20
    assert any("wer" in s for s in report["skipped"])
    assert any("speaker_sim" in s for s in report["skipped"])
    assert any("visqol" in s for s in report["skipped"])


def test_evaluate_pairs_with_transcripts_and_asr_callable():
    ref = np.zeros(1600, np.float32)
    gen = np.zeros(1600, np.float32)
    report = quality.evaluate_pairs(
        [(ref, gen)], sr=16000,
        transcripts=[("the cat sat", "the cat sat")])
    assert report["wer"] == 0.0 and report["cer"] == 0.0

    report = quality.evaluate_pairs(
        [(ref, gen)], sr=16000, ref_texts=["the cat sat"],
        asr=lambda wav, sr: "the dog sat")
    assert report["wer"] == pytest.approx(1 / 3)


def test_eval_quality_cli(tmp_path):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import eval_quality

    from ssr_speech_tpu.utils import audio as audio_io

    rng = np.random.default_rng(1)
    rows = []
    for i in range(2):
        ref = (rng.normal(size=(1, 8000)) * 0.1).astype(np.float32)
        gen = ref + rng.normal(size=(1, 8000)).astype(np.float32) * 0.001
        rp, gp = str(tmp_path / f"r{i}.wav"), str(tmp_path / f"g{i}.wav")
        audio_io.write_wav(rp, ref, 16000)
        audio_io.write_wav(gp, gen, 16000)
        rows.append(dict(ref=rp, gen=gp, text="hello there",
                         hyp="hello there"))
    mf = str(tmp_path / "pairs.jsonl")
    with open(mf, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    out = str(tmp_path / "report.json")
    eval_quality.main(["--pairs", mf, "--out", out])
    report = json.load(open(out))
    assert report["n"] == 2 and report["wer"] == 0.0
    assert "si_snr_db" in report
