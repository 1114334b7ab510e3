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


CAUSAL_CODEC = dataclasses.replace(
    CODEC, seanet=dataclasses.replace(CODEC.seanet, causal=True,
                                      trim_right_ratio=1.0))


def _tts_jobs(artifacts, path, names):
    orig = "this is a test of batch serving"
    with open(path, "w") as f:
        for name in names:
            f.write(json.dumps(dict(
                orig_audio=os.path.join(artifacts["dir"], "in.wav"),
                orig_transcript=orig,
                target_transcript=f"a fresh line for {name}",
                alignment_file=os.path.join(artifacts["dir"], "align.csv"),
                tts=True, savename=name)) + "\n")


def test_serve_cli_stream(artifacts, monkeypatch, tmp_path):
    """--stream: TTS jobs through the multi-client streaming server; the
    concatenated emitted chunks must equal the final wav, and the emission
    manifest must show incremental (time-ordered) chunks."""
    import ssr_speech_tpu.inference.cli as cli_mod

    causal_params = wm.init_wmencodec(jax.random.PRNGKey(2), CAUSAL_CODEC)

    def load_codec_causal(path):
        from ssr_speech_tpu.data.tokenizer import AudioTokenizer

        return AudioTokenizer(causal_params, CAUSAL_CODEC)

    monkeypatch.setattr(cli_mod, "load_codec", load_codec_causal)
    jobs_path = str(tmp_path / "tts_jobs.jsonl")
    _tts_jobs(artifacts, jobs_path, ["s0", "s1"])
    out_dir = str(tmp_path / "stream")
    serve_cli.main([
        "--model_path", artifacts["lm"], "--codec_path", artifacts["codec"],
        "--jobs", jobs_path, "--output_dir", out_dir, "--stream",
        "--chunk_frames", "10", "--n_slots", "2", "--top_k", "1",
        "--stop_repetition", "-1", "--save_chunks",
    ])
    for name in ["s0", "s1"]:
        wav, sr = audio_io.read_wav(os.path.join(out_dir, name + ".wav"))
        assert sr == 16000 and wav.shape[-1] > 0 and np.isfinite(wav).all()
        lines = [json.loads(l) for l in
                 open(os.path.join(out_dir, name + ".stream.jsonl"))]
        assert len(lines) >= 1
        ts = [l["t"] for l in lines]
        assert ts == sorted(ts)
        assert sum(l["samples"] for l in lines) == wav.shape[-1]
        cdir = os.path.join(out_dir, name + ".chunks")
        chunks = sorted(os.listdir(cdir))
        assert len(chunks) == len(lines)
        cat = np.concatenate(
            [audio_io.read_wav(os.path.join(cdir, c))[0] for c in chunks],
            axis=-1)
        np.testing.assert_allclose(cat, wav, atol=1e-4)


def test_serve_cli_stream_rejects_edit_jobs(artifacts, monkeypatch, tmp_path):
    _patch_codec(monkeypatch)
    out_dir = str(tmp_path / "stream_bad")
    with pytest.raises(SystemExit, match="tts"):
        serve_cli.main([
            "--model_path", artifacts["lm"],
            "--codec_path", artifacts["codec"],
            "--jobs", artifacts["jobs"], "--output_dir", out_dir, "--stream",
            "--chunk_frames", "10", "--n_slots", "2",
        ])
