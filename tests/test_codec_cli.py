"""Smoke tests for the codec training CLI pieces: audio dataset, bootstrap,
and one training update over real (synthetic) wav files."""

import json

import jax
import numpy as np
import pytest

from ssr_speech_tpu.config import CodecConfig, RVQConfig, SEANetConfig
from ssr_speech_tpu.data.audio_dataset import AudioSegmentDataset
from ssr_speech_tpu.models.codec import wmencodec as wm
from ssr_speech_tpu.train_codec import bootstrap_wm_from_codec
from ssr_speech_tpu.utils import audio as audio_io

TINY = CodecConfig(
    seanet=SEANetConfig(dimension=16, n_filters=2, n_residual_layers=1,
                        ratios=(8, 5, 4, 2), lstm=1, norm="weight_norm",
                        pad_mode="constant"),
    rvq=RVQConfig(dimension=16, n_q=2, bins=11),
)


def make_manifest(tmp_path, n=3, dur=1.2):
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        path = str(tmp_path / f"a{i}.wav")
        t = int(16000 * dur)
        audio_io.write_wav(path, (rng.normal(size=(1, t)) * 0.1).astype(np.float32), 16000)
        lines.append(json.dumps({"path": path, "duration": dur, "sample_rate": 16000}))
    mf = str(tmp_path / "data.jsonl")
    with open(mf, "w") as f:
        f.write("\n".join(lines))
    return mf


def test_audio_segment_dataset(tmp_path):
    mf = make_manifest(tmp_path)
    ds = AudioSegmentDataset(mf, TINY, segment_duration=0.5, seed=1)
    assert len(ds) == 3
    seg = ds.sample_segment()
    assert seg.shape[0] % TINY.hop_length == 0
    batches = list(ds.batches(2, 3))
    assert len(batches) == 3
    assert batches[0].shape == (2, seg.shape[0], 1)


def test_audio_segment_short_file_padded(tmp_path):
    mf = make_manifest(tmp_path, n=1, dur=0.1)
    ds = AudioSegmentDataset(mf, TINY, segment_duration=1.0, seed=1,
                             min_audio_duration=0.05)
    seg = ds.sample_segment(0)
    assert seg.shape[0] == ds.segment_samples
    assert np.abs(seg[-100:]).max() == 0.0  # zero padded tail


def test_bootstrap_wm_from_codec():
    params = wm.init_wmencodec(jax.random.PRNGKey(0), TINY)
    boot = bootstrap_wm_from_codec(params)
    a = jax.tree.leaves(boot["wmdecoder"]["decoder"])
    b = jax.tree.leaves(boot["decoder"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    c = jax.tree.leaves(boot["wmdecoder"]["wm_encoder"])
    d = jax.tree.leaves(boot["encoder"])
    for x, y in zip(c, d):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_prep_encode_cli(tmp_path):
    import dataclasses

    from ssr_speech_tpu.data import prep
    from ssr_speech_tpu.utils import checkpoint as ckpt

    mf = make_manifest(tmp_path, n=3, dur=1.0)
    codec_params = wm.init_wmencodec(jax.random.PRNGKey(0), TINY)
    codec_path = str(tmp_path / "codec.pkl")
    ckpt.save_bundle(codec_path, params=codec_params,
                     config=dataclasses.asdict(TINY))
    # prep encode takes a jsonl manifest of {path}
    save_dir = str(tmp_path / "codes")
    prep.main(["encode", "--manifest", mf, "--codec_path", codec_path,
               "--save_dir", save_dir, "--batch_size", "2",
               "--bucket_frames", "8"])
    import os

    files = sorted(os.listdir(save_dir))
    assert len(files) == 3
    rows = open(os.path.join(save_dir, files[0])).read().strip().split("\n")
    assert len(rows) == TINY.rvq.n_q
    vals = [int(v) for v in rows[0].split()]
    assert all(0 <= v < TINY.rvq.bins for v in vals)
    # frame count = duration * sample_rate / hop
    assert len(vals) == int(1.0 * TINY.sample_rate) // TINY.hop_length


@pytest.mark.slow
def test_train_codec_main_with_generate_stage(tmp_path):
    """Full train_codec.main at tiny geometry: a few GAN steps, bundle save,
    and the generate stage (SampleManager + stub-ViSQOL, reference
    solvers/base.py:478-487)."""
    import dataclasses
    import os
    import stat

    from ssr_speech_tpu import train_codec
    from tests.test_visqol import STUB

    mf = make_manifest(tmp_path, n=2, dur=1.0)
    exp = str(tmp_path / "exp")
    # stub visqol install
    vq = tmp_path / "visqol"
    (vq / "bazel-bin").mkdir(parents=True)
    (vq / "model").mkdir()
    exe = vq / "bazel-bin" / "visqol"
    exe.write_text(STUB)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)

    cfg_json = str(tmp_path / "codec.json")
    with open(cfg_json, "w") as f:
        json.dump(dataclasses.asdict(TINY), f)

    train_codec.main([
        "--manifest", mf, "--exp_dir", exp, "--batch_size", "2",
        "--segment_duration", "0.5", "--updates", "2", "--epochs", "1",
        "--save_every", "2", "--eval_every", "2", "--generate_every", "2",
        "--config_json", cfg_json, "--visqol_bin", str(vq),
    ])
    assert os.path.exists(os.path.join(exp, "codec_bundle.pkl"))
    sample_dirs = os.listdir(os.path.join(exp, "samples"))
    assert any(d.startswith("epoch_") for d in sample_dirs)
    epoch_dir = os.path.join(exp, "samples", sample_dirs[0])
    wavs = [f for f in os.listdir(epoch_dir) if f.endswith(".wav")]
    assert wavs, "generate stage stored no samples"


def test_tiny_codec_config_json_roundtrip(tmp_path):
    """The debug codec factory + resolved-config persistence: tiny config ->
    config_to_json -> codec_config_from_json is exact, and the geometry
    initializes (the same path train_codec uses for exp_dir/config.json)."""
    import jax

    from ssr_speech_tpu.config import (
        codec_config_from_json, config_to_json, tiny_codec_config,
    )
    from ssr_speech_tpu.models.codec import wmencodec as wm

    cfg = tiny_codec_config()
    back = codec_config_from_json(config_to_json(cfg))
    assert back == cfg
    params = wm.init_wmencodec(jax.random.PRNGKey(0), back)
    assert set(params) == {"encoder", "decoder", "quantizer", "wmdecoder"}
