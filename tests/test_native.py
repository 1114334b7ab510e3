"""Native C++ runtime ops: build, parse, alignment parity with the python DP."""

import numpy as np
import pytest

from ssr_speech_tpu import native
from ssr_speech_tpu.inference import edit


def test_native_builds():
    assert native.available(), "g++ build of ssr_native.cpp failed"


def test_parse_int_matrix(tmp_path):
    path = str(tmp_path / "codes.txt")
    with open(path, "w") as f:
        f.write("1 2 3 4 5\n10 20 30 40 50\n7 8 9 10 11\n-1 0 1 2 3\n")
    m = native.parse_int_matrix(path, max_rows=4)
    np.testing.assert_array_equal(
        m, [[1, 2, 3, 4, 5], [10, 20, 30, 40, 50], [7, 8, 9, 10, 11],
            [-1, 0, 1, 2, 3]]
    )


def test_parse_int_matrix_big(tmp_path):
    rng = np.random.default_rng(0)
    want = rng.integers(0, 2048, size=(4, 1000))
    path = str(tmp_path / "big.txt")
    with open(path, "w") as f:
        for row in want:
            f.write(" ".join(str(v) for v in row) + "\n")
    got = native.parse_int_matrix(path, max_rows=4)
    np.testing.assert_array_equal(got, want)


def test_parse_missing_file():
    assert native.parse_int_matrix("/nonexistent/x.txt") is None


def test_levenshtein_matches_python_dp():
    rng = np.random.default_rng(1)
    for _ in range(30):
        n, m = rng.integers(0, 15, size=2)
        a = [str(v) for v in rng.integers(0, 6, size=n)]
        b = [str(v) for v in rng.integers(0, 6, size=m)]
        got = edit.align_ops(a, b)  # native path
        # force the python DP by mapping through unavailable native:
        ids = {t: i for i, t in enumerate(dict.fromkeys(a + b))}
        want = edit.align_ops.__wrapped__(a, b) if hasattr(edit.align_ops, "__wrapped__") else None
        if want is None:
            # recompute with python fallback via private DP: temporarily
            # monkeypatch availability
            import ssr_speech_tpu.native as nat

            real = nat.available
            nat.available = lambda: False
            try:
                want = edit.align_ops(a, b)
            finally:
                nat.available = real
        assert got == want, (a, b, got, want)


def test_pad_collate():
    rows = [np.arange(3), np.arange(7), np.arange(1)]
    out = native.pad_collate(rows, width=5, pad_value=-7)
    np.testing.assert_array_equal(out[0], [0, 1, 2, -7, -7])
    np.testing.assert_array_equal(out[1], [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(out[2], [0, -7, -7, -7, -7])


def test_load_wav_batch_matches_python(tmp_path):
    """Threaded C++ WAV loader: mono-mix + crop equals the python path for
    16-bit stereo and float32 mono; short files zero-pad."""
    import json

    from ssr_speech_tpu.utils import audio as audio_io

    sr, seg = 16000, 4000
    rng = np.random.default_rng(0)
    stereo = (rng.normal(size=(2, 9000)) * 0.1).astype(np.float32)
    mono = (rng.normal(size=(1, 2500)) * 0.1).astype(np.float32)  # short
    p1, p2 = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    audio_io.write_wav(p1, stereo, sr)  # [C, T] 16-bit PCM stereo
    audio_io.write_wav(p2, mono[0], sr)
    got, errs = native.load_wav_batch([p1, p2], sr, seg,
                                      np.asarray([0.25, 0.0]), n_threads=2)
    assert list(errs) == [0, 0]
    w1, _ = audio_io.read_wav(p1)
    w1m = w1.mean(axis=0)
    start = int(0.25 * (w1m.shape[0] - seg + 1))
    np.testing.assert_allclose(got[0], w1m[start:start + seg], atol=1e-6)
    w2, _ = audio_io.read_wav(p2)
    want2 = np.zeros(seg, np.float32)
    want2[: w2.shape[1]] = w2[0]
    np.testing.assert_allclose(got[1], want2, atol=1e-6)


def test_audio_dataset_native_loader(tmp_path):
    """AudioSegmentDataset(loader_threads>0): native batches come back the
    right shape; a file at the wrong sample rate falls back per-row."""
    import json

    from ssr_speech_tpu.config import CodecConfig
    from ssr_speech_tpu.data.audio_dataset import AudioSegmentDataset
    from ssr_speech_tpu.utils import audio as audio_io

    cfg = CodecConfig()
    rng = np.random.default_rng(1)
    entries = []
    ok = str(tmp_path / "ok.wav")
    audio_io.write_wav(ok, (rng.normal(size=48000) * 0.1).astype(np.float32),
                       cfg.sample_rate)
    entries.append(dict(path=ok, duration=3.0, sample_rate=cfg.sample_rate))
    other = str(tmp_path / "other.wav")
    audio_io.write_wav(other,
                       (rng.normal(size=44100) * 0.1).astype(np.float32),
                       44100)  # needs resample -> python fallback row
    entries.append(dict(path=other, duration=1.0, sample_rate=44100))
    manifest = str(tmp_path / "data.jsonl")
    with open(manifest, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    ds = AudioSegmentDataset(manifest, cfg, segment_duration=1.0, seed=0,
                             loader_threads=2)
    batches = list(ds.batches(4, 2))
    assert len(batches) == 2
    for b in batches:
        assert b.shape == (4, ds.segment_samples, 1)
        assert b.dtype == np.float32
        assert np.isfinite(b).all() and np.abs(b).max() > 0


def test_load_wav_batch_corrupt_chunk_terminates(tmp_path):
    """A WAV whose chunk header claims csize near UINT32_MAX must error out,
    not wrap the 32-bit advance to zero and spin a worker thread forever."""
    import struct

    p = str(tmp_path / "corrupt.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 100))
        f.write(b"WAVE")
        f.write(b"junk")
        f.write(struct.pack("<I", 0xFFFFFFF7))  # 8 + csize wraps to 0
        f.write(b"\x00" * 64)
    out, errs = native.load_wav_batch([p], 16000, 1000,
                                      np.asarray([0.0]), n_threads=1)
    assert errs[0] != 0
    assert np.all(out[0] == 0)
