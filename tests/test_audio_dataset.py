"""AudioSegmentDataset sampling-option parity
(reference audiocraft/audiocraft/data/audio_dataset.py:272-303,356-369,
434-454 — round-2 VERDICT item 6)."""

import json

import numpy as np
import pytest

from ssr_speech_tpu.config import CodecConfig, RVQConfig, SEANetConfig
from ssr_speech_tpu.data.audio_dataset import AudioSegmentDataset
from ssr_speech_tpu.utils import audio as audio_io

TINY = CodecConfig(
    seanet=SEANetConfig(dimension=8, n_filters=2, n_residual_layers=1,
                        ratios=(4, 2), lstm=0, norm="none",
                        pad_mode="constant"),
    rvq=RVQConfig(dimension=8, n_q=2, bins=17),
)


def _manifest(tmp_path, entries):
    rng = np.random.default_rng(0)
    lines = []
    for i, e in enumerate(entries):
        path = str(tmp_path / f"a{i}.wav")
        t = int(TINY.sample_rate * e["duration"])
        audio_io.write_wav(
            path, (rng.normal(size=(1, max(t, 1))) * 0.1).astype(np.float32),
            TINY.sample_rate)
        lines.append(json.dumps({**e, "path": path,
                                 "sample_rate": TINY.sample_rate}))
    mf = str(tmp_path / "data.jsonl")
    with open(mf, "w") as f:
        f.write("\n".join(lines))
    return mf


def test_duration_weighted_sampling_distribution(tmp_path):
    """sample_on_duration: a 4x-longer file is picked ~4x as often
    (per-second sampling, reference audio_dataset.py:356-369)."""
    mf = _manifest(tmp_path, [dict(duration=0.4), dict(duration=1.6)])
    ds = AudioSegmentDataset(mf, TINY, segment_duration=0.2, seed=3,
                             sample_on_duration=True, sample_on_weight=False)
    np.testing.assert_allclose(ds.sampling_probabilities, [0.2, 0.8])
    picks = np.asarray([ds._sample_file_idx() for _ in range(4000)])
    assert 0.75 < (picks == 1).mean() < 0.85

    uni = AudioSegmentDataset(mf, TINY, segment_duration=0.2, seed=3,
                              sample_on_duration=False, sample_on_weight=False)
    picks = np.asarray([uni._sample_file_idx() for _ in range(4000)])
    assert 0.45 < (picks == 1).mean() < 0.55


def test_weight_sampling_and_product(tmp_path):
    """sample_on_weight uses the manifest 'weight'; with sample_on_duration
    the score is the product (reference audio_dataset.py:359-365)."""
    mf = _manifest(tmp_path, [dict(duration=1.0, weight=3.0),
                              dict(duration=2.0, weight=0.5)])
    ds = AudioSegmentDataset(mf, TINY, segment_duration=0.2, seed=0)
    np.testing.assert_allclose(ds.sampling_probabilities, [0.75, 0.25])
    only_w = AudioSegmentDataset(mf, TINY, segment_duration=0.2, seed=0,
                                 sample_on_duration=False)
    np.testing.assert_allclose(only_w.sampling_probabilities, [6 / 7, 1 / 7])


def test_min_segment_ratio_tail_padding(tmp_path):
    """min_segment_ratio < 1 lets the seek overhang the file end: some
    segments carry a zero-padded tail (reference audio_dataset.py:436-448)."""
    mf = _manifest(tmp_path, [dict(duration=1.0)])
    ds = AudioSegmentDataset(mf, TINY, segment_duration=0.5, seed=5,
                             min_segment_ratio=0.5)
    padded = sum(float(np.abs(ds.sample_segment()[-8:]).max()) == 0.0
                 for _ in range(50))
    assert padded > 0  # seeks past dur - 0.5*seg happen and get padded
    strict = AudioSegmentDataset(mf, TINY, segment_duration=0.5, seed=5,
                                 min_segment_ratio=1.0)
    for _ in range(50):
        assert np.abs(strict.sample_segment()[-8:]).max() > 0.0


def test_pad_false_raises_on_short_read(tmp_path):
    mf = _manifest(tmp_path, [dict(duration=0.3)])
    ds = AudioSegmentDataset(mf, TINY, segment_duration=1.0, seed=0,
                             min_audio_duration=0.1, pad=False)
    with pytest.raises(ValueError, match="pad=False"):
        ds.sample_segment(0)


def test_max_read_retry_resamples_then_raises(tmp_path, caplog):
    """A corrupt file re-samples a different file; an all-corrupt manifest
    raises after max_read_retry tries (reference audio_dataset.py:449-454)."""
    mf = _manifest(tmp_path, [dict(duration=1.0), dict(duration=1.0)])
    # corrupt the second file
    metas = [json.loads(l) for l in open(mf)]
    with open(metas[1]["path"], "wb") as f:
        f.write(b"not a wav")
    ds = AudioSegmentDataset(mf, TINY, segment_duration=0.2, seed=1,
                             max_read_retry=20)
    for _ in range(20):  # always returns a valid segment (file 0 retried in)
        seg = ds.sample_segment()
        assert np.isfinite(seg).all()
    with open(metas[0]["path"], "wb") as f:
        f.write(b"also not a wav")
    ds2 = AudioSegmentDataset(mf, TINY, segment_duration=0.2, seed=1,
                              max_read_retry=3)
    with pytest.raises(Exception):
        ds2.sample_segment()


def test_max_audio_duration_filter(tmp_path):
    mf = _manifest(tmp_path, [dict(duration=0.5), dict(duration=3.0)])
    ds = AudioSegmentDataset(mf, TINY, segment_duration=0.2,
                             max_audio_duration=1.0)
    assert len(ds) == 1


def _zip_manifest(tmp_path, entries, gz=False):
    """Corpus stored INSIDE a zip archive; manifest paths use the reference's
    "<zip>:<member>" convention (data/zip.py:22 PathInZip)."""
    import gzip
    import zipfile

    rng = np.random.default_rng(0)
    zpath = str(tmp_path / "corpus.zip")
    lines = []
    with zipfile.ZipFile(zpath, "w") as zf:
        for i, e in enumerate(entries):
            t = int(TINY.sample_rate * e["duration"])
            loose = tmp_path / f"z{i}.wav"
            audio_io.write_wav(
                str(loose),
                (rng.normal(size=(1, max(t, 1))) * 0.1).astype(np.float32),
                TINY.sample_rate)
            member = f"audio/z{i}.wav"
            zf.write(str(loose), member)
            lines.append(json.dumps({**e, "path": f"{zpath}:{member}",
                                     "sample_rate": TINY.sample_rate}))
            loose.unlink()
    mf = str(tmp_path / ("data.jsonl.gz" if gz else "data.jsonl"))
    data = "\n".join(lines)
    if gz:
        with gzip.open(mf, "wt") as f:
            f.write(data)
    else:
        with open(mf, "w") as f:
            f.write(data)
    return mf


@pytest.mark.parametrize("gz", [False, True])
def test_zip_corpus_loads(tmp_path, gz):
    """Zip-member manifest paths + .jsonl.gz manifests: segments load with
    the same shapes/values as a loose-file corpus, through both the python
    path and the native-loader path (which falls back per-row for zip
    members it cannot parse natively)."""
    mf = _zip_manifest(tmp_path, [dict(duration=0.5), dict(duration=1.0)],
                       gz=gz)
    ds = AudioSegmentDataset(mf, TINY, segment_duration=0.25, seed=7)
    assert len(ds) == 2
    seg = ds.sample_segment()
    assert seg.shape == (ds.segment_samples,) and np.isfinite(seg).all()
    assert float(np.abs(seg).max()) > 0
    batches = list(ds.batches(batch_size=3, num_batches=2))
    assert all(b.shape == (3, ds.segment_samples, 1) for b in batches)
    # native-loader path: zip rows are unparseable natively and must come
    # back through the python fallback, not zeros/garbage
    ds_n = AudioSegmentDataset(mf, TINY, segment_duration=0.25, seed=7,
                               loader_threads=2)
    (b,) = list(ds_n.batches(batch_size=4, num_batches=1))
    assert b.shape == (4, ds_n.segment_samples, 1)
    assert np.isfinite(b).all() and (np.abs(b).max(axis=1) > 0).all()


def test_zip_handle_pool_caps_open_handles(tmp_path):
    """set_zip_cache_size evicts (and closes) LRU zipfile handles."""
    import zipfile

    from ssr_speech_tpu.utils.audio import (
        _zip_pool, read_wav, set_zip_cache_size)

    rng = np.random.default_rng(1)
    paths = []
    for i in range(4):
        zpath = str(tmp_path / f"p{i}.zip")
        loose = tmp_path / f"w{i}.wav"
        audio_io.write_wav(str(loose),
                           (rng.normal(size=(1, 64)) * 0.1).astype(np.float32),
                           TINY.sample_rate)
        with zipfile.ZipFile(zpath, "w") as zf:
            zf.write(str(loose), "w.wav")
        paths.append(f"{zpath}:w.wav")
    set_zip_cache_size(2)
    try:
        for p in paths:
            wav, sr = read_wav(p)
            assert sr == TINY.sample_rate and wav.shape[-1] == 64
        assert len(_zip_pool) <= 2
        wav2, _ = read_wav(paths[0])  # reopen after eviction
        np.testing.assert_array_equal(wav2, read_wav(paths[0])[0])
    finally:
        set_zip_cache_size(32)


@pytest.mark.slow
def test_codec_gan_smoke_from_zip_corpus(tmp_path):
    """train_codec consumes a zip-archived corpus end-to-end (round-4
    VERDICT item 7 'Done' bar)."""
    from ssr_speech_tpu import train_codec as tc

    mf = _zip_manifest(tmp_path, [dict(duration=1.0), dict(duration=1.0)])
    import dataclasses

    cfg_json = str(tmp_path / "cfg.json")
    with open(cfg_json, "w") as f:
        json.dump(dataclasses.asdict(TINY), f)
    tc.main([
        "--manifest", mf, "--exp_dir", str(tmp_path / "exp"),
        "--batch_size", "2", "--segment_duration", "0.25",
        "--updates", "2", "--epochs", "1", "--save_every", "2",
        "--eval_every", "1000", "--config_json", cfg_json,
    ])
    assert (tmp_path / "exp" / "codec_bundle.pkl").exists()


@pytest.mark.slow
def test_codec_gan_smoke_from_weighted_manifest(tmp_path):
    """train_codec runs end-to-end on a weighted manifest with the sampling
    flags (VERDICT item 6 'Done' bar)."""
    from ssr_speech_tpu import train_codec as tc

    mf = _manifest(tmp_path, [dict(duration=1.0, weight=5.0),
                              dict(duration=1.0, weight=0.1)])
    import dataclasses

    cfg_json = str(tmp_path / "cfg.json")
    with open(cfg_json, "w") as f:
        json.dump(dataclasses.asdict(TINY), f)
    tc.main([
        "--manifest", mf, "--exp_dir", str(tmp_path / "exp"),
        "--batch_size", "2", "--segment_duration", "0.25",
        "--updates", "2", "--epochs", "1", "--save_every", "2",
        "--eval_every", "1000", "--config_json", cfg_json,
        "--min_segment_ratio", "0.5", "--max_read_retry", "3",
    ])
    assert (tmp_path / "exp" / "codec_bundle.pkl").exists()
