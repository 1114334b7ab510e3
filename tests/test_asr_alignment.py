"""ASR-option parity tail + resolve_alignment composition (recorded fixtures).

The heavyweight whisper/wav2vec2 models are gated in this environment, so
these tests lock the surrounding logic with fakes:
  - ``numeral_suppress_ids`` reproduces the reference's digit-token scan
    (``/root/reference/inference_v2.py:73-78``),
  - ``resolve_alignment`` composes whisper ASR -> wav2vec2 forced alignment
    the way the reference composes WhisperxModel.transcribe -> align_model
    (``inference_v2.py:89-94``), verified against recorded word fixtures.
"""

from ssr_speech_tpu.inference import cli as cli_mod
from ssr_speech_tpu.utils.asr import numeral_suppress_ids


class FakeTok:
    """Minimal tokenizer: id -> recorded piece (some digits, some words)."""

    PIECES = ["hello", " world", "4", " 2", " 19", "1a", " ", "", "42nd",
              " 007", "x9", "ninety"]
    eos_token_id = len(PIECES)

    def decode(self, ids):
        return "".join(self.PIECES[i] if i < len(self.PIECES) else "<eot>"
                       for i in ids)

    def __len__(self):
        return len(self.PIECES)


def test_numeral_suppress_ids_matches_reference_rule():
    """Pure-digit pieces (after the leading-space strip) are suppressed;
    mixed alphanumerics, empties and words are not."""
    ids = numeral_suppress_ids(FakeTok())
    assert ids == [2, 3, 4, 9]  # "4", " 2", " 19", " 007"


# ------------------------------------------------- resolve_alignment fixtures

RECORDED_ASR = [("hello", 0.0, 0.4), ("there", 0.5, 0.9), ("world", 1.0, 1.4)]
RECORDED_ALIGNED = [("hello", 0.02, 0.38), ("there", 0.52, 0.88),
                    ("world", 1.01, 1.39)]


class FakeWhisper:
    built = []

    def __init__(self, model_id, *a, **k):
        FakeWhisper.built.append(model_id)

    def transcribe(self, audio_path):
        assert audio_path == "/fake/utt.wav"
        return list(RECORDED_ASR)


class FakeW2V:
    built = []

    def __init__(self, model_id, *a, **k):
        FakeW2V.built.append(model_id)

    def align(self, audio_path, transcript):
        # the re-align pass must receive the ASR words, space-joined
        # (cli.py resolve_alignment; reference inference_v2.py:89-94)
        assert audio_path == "/fake/utt.wav"
        assert transcript == "hello there world"
        return list(RECORDED_ALIGNED)


def test_resolve_alignment_whisper_only(monkeypatch):
    from ssr_speech_tpu.utils import asr as asr_mod

    monkeypatch.setattr(asr_mod, "WhisperAligner", FakeWhisper)
    words = cli_mod.resolve_alignment(
        "/fake/utt.wav", "", whisper_model="openai/whisper-tiny")
    assert words == RECORDED_ASR
    assert FakeWhisper.built[-1] == "openai/whisper-tiny"


def test_resolve_alignment_whisper_then_forced_align(monkeypatch):
    """The whisperx-equivalent composition: ASR transcript is re-aligned by
    the wav2vec2 forced aligner; the aligner's (tighter) times win."""
    from ssr_speech_tpu.utils import asr as asr_mod
    from ssr_speech_tpu.utils import forced_align as fa_mod

    monkeypatch.setattr(asr_mod, "WhisperAligner", FakeWhisper)
    monkeypatch.setattr(fa_mod, "Wav2Vec2Aligner", FakeW2V)
    words = cli_mod.resolve_alignment(
        "/fake/utt.wav", "", whisper_model="openai/whisper-tiny",
        align_model="w2v2-base")
    assert words == RECORDED_ALIGNED
    assert FakeW2V.built[-1] == "w2v2-base"


def test_resolve_alignment_known_transcript_skips_asr(monkeypatch):
    """With a known transcript, only the forced aligner runs (reference
    edit mode knows orig_transcript; ASR is for the unknown case)."""
    from ssr_speech_tpu.utils import forced_align as fa_mod

    class NoAsrW2V(FakeW2V):
        def align(self, audio_path, transcript):
            assert transcript == "hello there world"
            return list(RECORDED_ALIGNED)

    monkeypatch.setattr(fa_mod, "Wav2Vec2Aligner", NoAsrW2V)
    words = cli_mod.resolve_alignment(
        "/fake/utt.wav", "hello there world", align_model="w2v2-base")
    assert words == RECORDED_ALIGNED
