"""End-to-end CLI integration: editing + TTS over the demo wav with tiny
random-weight bundles, exercising bundle load, alignment parsing, span diff,
mask intervals, generation, watermark decode and wav output."""

import csv
import dataclasses
import os

import jax
import numpy as np
import pytest

from ssr_speech_tpu.config import (
    CodecConfig, RVQConfig, SEANetConfig, tiny_ssr_config,
)
from ssr_speech_tpu.inference import cli
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.models.codec import wmencodec as wm
from ssr_speech_tpu.utils import audio as audio_io
from ssr_speech_tpu.utils import checkpoint as ckpt

CFG = tiny_ssr_config(text_vocab_size=40)
CODEC = CodecConfig(
    seanet=SEANetConfig(dimension=16, n_filters=2, n_residual_layers=1,
                        ratios=(8, 5, 4, 2), lstm=1, norm="weight_norm",
                        pad_mode="constant"),
    rvq=RVQConfig(dimension=16, n_q=CFG.n_codebooks,
                  bins=CFG.tokens.audio_vocab_size),
)


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    # LM bundle in our format
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), CFG)
    phn2num = {c: i for i, c in enumerate(
        "abcdefghijklmnopqrstuvwxyz_.!?,' " + "今天气很好不错")}
    lm_path = str(d / "bundle.pkl")
    ckpt.save_bundle(lm_path, params=params,
                     model_config=dataclasses.asdict(CFG), phn2num=phn2num)
    # codec bundle
    codec_params = wm.init_wmencodec(jax.random.PRNGKey(1), CODEC)
    codec_path = str(d / "codec.pkl")
    ckpt.save_bundle(codec_path, params=codec_params,
                     config=dataclasses.asdict(CODEC))
    # audio: demo wav when present, synthetic otherwise
    demo = "/root/reference/demo/84_121550_000074_000000.wav"
    if os.path.isfile(demo):
        wav_path = demo
    else:
        rng = np.random.default_rng(0)
        wav_path = str(d / "in.wav")
        audio_io.write_wav(wav_path,
                           (rng.normal(size=(1, 48000)) * 0.1).astype(np.float32),
                           16000)
    wav, sr = audio_io.read_wav(wav_path)
    dur = wav.shape[-1] / sr
    # synthetic word alignment spanning the audio
    words = ["but", "when", "i", "had", "approached", "so", "near", "to", "them"]
    align_path = str(d / "align.csv")
    step = dur / (len(words) + 1)
    with open(align_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["word", "start", "end"])
        for i, word in enumerate(words):
            w.writerow([word, round(i * step + 0.05, 3), round((i + 1) * step, 3)])
    out_dir = str(d / "out")
    return dict(lm=lm_path, codec=codec_path, wav=wav_path, align=align_path,
                out=out_dir, orig=" ".join(words), dur=dur)


def _patch_codec_cfg(monkeypatch):
    # the CLI instantiates the default (full-size) CodecConfig; steer it to
    # the tiny test geometry
    import ssr_speech_tpu.inference.cli as cli_mod

    real = cli_mod.load_codec

    def load_codec_tiny(path):
        from ssr_speech_tpu.data.tokenizer import AudioTokenizer

        params = ckpt.load_bundle(path)["params"]
        return AudioTokenizer(params, CODEC)

    cli_mod.load_codec = load_codec_tiny
    return real


def test_cli_editing(artifacts, monkeypatch, tmp_path):
    real = _patch_codec_cfg(monkeypatch)
    try:
        cli.main([
            "--model_path", artifacts["lm"],
            "--codec_path", artifacts["codec"],
            "--orig_audio", artifacts["wav"],
            "--orig_transcript", artifacts["orig"],
            "--target_transcript",
            "but when i saw the mirage so near to them",
            "--alignment_file", artifacts["align"],
            "--output_dir", artifacts["out"],
            "--savename", "edit",
            "--use_watermark", "--top_k", "5", "--stop_repetition", "-1",
        ])
    finally:
        import ssr_speech_tpu.inference.cli as cli_mod

        cli_mod.load_codec = real
    out_path = os.path.join(artifacts["out"], "edit.wav")
    assert os.path.isfile(out_path)
    wav, sr = audio_io.read_wav(out_path)
    assert sr == 16000 and wav.shape[-1] > 0
    assert np.isfinite(wav).all()


def test_cli_tts(artifacts, monkeypatch):
    real = _patch_codec_cfg(monkeypatch)
    try:
        cli.main([
            "--model_path", artifacts["lm"],
            "--codec_path", artifacts["codec"],
            "--orig_audio", artifacts["wav"],
            "--orig_transcript", artifacts["orig"],
            "--target_transcript", "a brand new sentence to speak",
            "--alignment_file", artifacts["align"],
            "--output_dir", artifacts["out"],
            "--savename", "tts", "--tts", "--prompt_length", "2.0",
            "--top_k", "5", "--stop_repetition", "-1",
        ])
    finally:
        import ssr_speech_tpu.inference.cli as cli_mod

        cli_mod.load_codec = real
    out_path = os.path.join(artifacts["out"], "tts.wav")
    assert os.path.isfile(out_path)


def test_cli_zh_editing(artifacts, monkeypatch, tmp_path):
    """Mandarin path: char-level diff, zh TTS text concat, opencc gated."""
    import csv

    real = _patch_codec_cfg(monkeypatch)
    # char-level alignment for a fake zh transcript
    zh_words = list("今天天气很好")
    align_path = str(tmp_path / "zh_align.csv")
    step = artifacts["dur"] / (len(zh_words) + 1)
    with open(align_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["word", "start", "end"])
        for i, ch in enumerate(zh_words):
            w.writerow([ch, round(i * step + 0.05, 3), round((i + 1) * step, 3)])
    try:
        cli.main([
            "--model_path", artifacts["lm"],
            "--codec_path", artifacts["codec"],
            "--orig_audio", artifacts["wav"],
            "--orig_transcript", "今天天气很好",
            "--target_transcript", "今天天气不错",
            "--alignment_file", align_path,
            "--language", "zh",
            "--output_dir", artifacts["out"],
            "--savename", "zh_edit",
            "--top_k", "5", "--stop_repetition", "-1", "--cfg_stride", "1",
        ])
    finally:
        import ssr_speech_tpu.inference.cli as cli_mod

        cli_mod.load_codec = real
    import os

    assert os.path.isfile(os.path.join(artifacts["out"], "zh_edit.wav"))


def test_detect_cli(artifacts, monkeypatch, capsys):
    import json as _json

    real = _patch_codec_cfg(monkeypatch)
    try:
        from ssr_speech_tpu.inference import detect_cli

        detect_cli.main(["--codec_path", artifacts["codec"],
                         "--audio", artifacts["wav"]])
    finally:
        import ssr_speech_tpu.inference.cli as cli_mod

        cli_mod.load_codec = real
    out = capsys.readouterr().out.strip().splitlines()[-1]
    row = _json.loads(out)
    assert row["frames"] > 0
    assert 0.0 <= row["watermarked_fraction"] <= 1.0
    assert isinstance(row["flagged"], bool)
