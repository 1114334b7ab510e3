"""Batch serving CLI: a JSONL jobs file through one model load, in both
static-sorted and continuous modes."""

import csv
import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from ssr_speech_tpu.config import (
    CodecConfig, RVQConfig, SEANetConfig, tiny_ssr_config,
)
from ssr_speech_tpu.inference import serve_cli
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
    d = tmp_path_factory.mktemp("serve_cli")
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), CFG)
    phn2num = {c: i for i, c in enumerate(
        "abcdefghijklmnopqrstuvwxyz_.!?,' ")}
    lm_path = str(d / "bundle.pkl")
    ckpt.save_bundle(lm_path, params=params,
                     model_config=dataclasses.asdict(CFG), phn2num=phn2num)
    codec_params = wm.init_wmencodec(jax.random.PRNGKey(1), CODEC)
    codec_path = str(d / "codec.pkl")
    ckpt.save_bundle(codec_path, params=codec_params,
                     config=dataclasses.asdict(CODEC))
    rng = np.random.default_rng(0)
    wav_path = str(d / "in.wav")
    audio_io.write_wav(wav_path,
                       (rng.normal(size=48000) * 0.1).astype(np.float32),
                       16000)
    words = ["this", "is", "a", "test", "of", "batch", "serving"]
    align_path = str(d / "align.csv")
    step = 3.0 / (len(words) + 1)
    with open(align_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["word", "start", "end"])
        for i, word in enumerate(words):
            w.writerow([word, round(i * step + 0.05, 3),
                        round((i + 1) * step, 3)])
    jobs_path = str(d / "jobs.jsonl")
    orig = " ".join(words)
    with open(jobs_path, "w") as f:
        f.write(json.dumps(dict(
            orig_audio=wav_path, orig_transcript=orig,
            target_transcript="this is a demo of batch serving",
            alignment_file=align_path, savename="edit0")) + "\n")
        f.write(json.dumps(dict(
            orig_audio=wav_path, orig_transcript=orig,
            target_transcript="a fresh new line",
            alignment_file=align_path, tts=True, savename="tts1")) + "\n")
        f.write(json.dumps(dict(
            orig_audio=wav_path, orig_transcript=orig,
            target_transcript="this is a quiz of batch serving",
            alignment_file=align_path, savename="edit2")) + "\n")
    return dict(lm=lm_path, codec=codec_path, jobs=jobs_path, dir=str(d))


def _patch_codec(monkeypatch):
    import ssr_speech_tpu.inference.cli as cli_mod

    def load_codec_tiny(path):
        from ssr_speech_tpu.data.tokenizer import AudioTokenizer

        params = ckpt.load_bundle(path)["params"]
        return AudioTokenizer(params, CODEC)

    monkeypatch.setattr(cli_mod, "load_codec", load_codec_tiny)


@pytest.mark.parametrize("mode", ["sorted", "continuous"])
def test_serve_cli_jobs(artifacts, monkeypatch, tmp_path, mode):
    _patch_codec(monkeypatch)
    out_dir = str(tmp_path / mode)
    argv = [
        "--model_path", artifacts["lm"], "--codec_path", artifacts["codec"],
        "--jobs", artifacts["jobs"], "--output_dir", out_dir,
        "--top_k", "5", "--stop_repetition", "-1", "--n_slots", "2",
    ]
    if mode == "continuous":
        argv.append("--continuous")
    serve_cli.main(argv)
    for name in ["edit0", "tts1", "edit2"]:
        path = os.path.join(out_dir, name + ".wav")
        assert os.path.isfile(path), name
        wav, sr = audio_io.read_wav(path)
        assert sr == 16000 and wav.shape[-1] > 0
        assert np.isfinite(wav).all()
