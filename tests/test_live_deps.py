"""Opt-in live-backend integration tests (``-m live_deps``).

Everywhere else the suite proves espeak / whisper / ViSQOL behavior through
recorded mocks and synthetic fixtures because the live backends are absent
in this zero-egress image. These tests exercise the REAL backends — they
skip today and light up with zero new code the moment the environment gains
any of them:

  - espeak-ng via the ``phonemizer`` package (reference
    ``data/tokenizer.py:46`` builds EspeakBackend);
  - whisper ASR word timestamps via transformers (reference
    ``inference_v2.py:56-94`` whisperx/whisper path);
  - the google/visqol binary (reference
    ``audiocraft/audiocraft/metrics/visqol.py:22``), located via
    ``SSR_VISQOL_BIN`` (install dir or executable) or ``visqol`` on PATH;
  - the published-weight replay gate lives in ``test_pretrained.py``
    (``needs_goldens`` + ``SSR_PRETRAINED_DIR``), also marked live_deps.

Run: ``python -m pytest tests/ -m live_deps`` (see README "Live-backend
tests"). Each test asserts the contract the recorded mocks lock, so a live
run cross-validates the mocks themselves.
"""

import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.live_deps

DEMO_WAV = "/root/reference/demo/84_121550_000074_000000.wav"


def _have_live_espeak() -> bool:
    from ssr_speech_tpu.data import tokenizer as tok_mod

    if not tok_mod.HAVE_PHONEMIZER:
        return False
    try:  # the package can be installed with no usable espeak library
        tok_mod.EspeakBackend("en-us")
        return True
    except Exception:
        return False


def test_live_espeak_phonemize_contract():
    """Real espeak: IPA phones (not characters), the word separator
    convention, and GigaSpeech-tag survival — the exact contract the
    recorded-mock parity suite (test_phonemizer_parity.py) locks."""
    if not _have_live_espeak():
        pytest.skip("phonemizer/espeak-ng not installed")
    from ssr_speech_tpu.data.prep import gs_phonemize_text
    from ssr_speech_tpu.data.tokenizer import TextTokenizer

    tok = TextTokenizer()
    assert tok.backend is not None
    phones = tok("but when i had approached so near to them")
    assert len(phones) > 8 and "_" in phones
    # espeak output is IPA, not the input characters
    assert any(p not in "butwhenihadapproachedsoneartothem_" for p in phones)
    # determinism (espeak is deterministic for a fixed voice)
    assert tok("hello world") == tok("hello world")
    # GigaSpeech punctuation tags collapse onto the preceding word
    tagged = gs_phonemize_text(tok, "hello <COMMA> world <PERIOD>")
    assert tagged is not None and "," in tagged and "." in tagged


def test_live_whisper_word_timestamps():
    """Real whisper-tiny: word-level timestamps over the demo wav feed
    resolve_alignment; numeral suppression ids come from the live
    tokenizer (reference inference_v2.py:73-78)."""
    pytest.importorskip("transformers")
    if not os.path.isfile(DEMO_WAV):
        pytest.skip("demo wav absent")
    from ssr_speech_tpu.utils.asr import WhisperAligner

    try:
        aligner = WhisperAligner("openai/whisper-tiny.en",
                                 suppress_numerals=True)
    except Exception as e:  # zero-egress image: weights not fetchable
        pytest.skip(f"whisper-tiny weights unavailable: {e!r}")
    words = aligner.transcribe(DEMO_WAV)
    assert words, "no words transcribed"
    text = " ".join(w for w, _, _ in words).lower()
    assert "near" in text or "them" in text  # demo utterance content
    starts = [s for _, s, _ in words]
    assert all(0.0 <= s <= 10.0 for s in starts)
    assert starts == sorted(starts)
    assert all(e >= s for _, s, e in words)
    assert aligner.suppress_ids  # digit ids found in the live vocab


def _find_visqol():
    p = os.environ.get("SSR_VISQOL_BIN")
    if p and os.path.exists(p):
        return p
    return shutil.which("visqol")


def test_live_visqol_mos():
    """Real ViSQOL binary: an identical pair scores near the 5.0 ceiling
    and a noise-degraded pair scores strictly lower (speech mode, 16 kHz),
    through the same batch-CSV driver the stub test exercises."""
    binary = _find_visqol()
    if binary is None:
        pytest.skip("visqol binary not found (SSR_VISQOL_BIN or PATH)")
    from ssr_speech_tpu.utils.visqol import ViSQOL

    rng = np.random.default_rng(0)
    t = np.arange(16000 * 2) / 16000.0
    clean = (0.4 * np.sin(2 * np.pi * 220 * t)
             + 0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    noisy = clean + rng.normal(size=clean.shape).astype(np.float32) * 0.1
    v = ViSQOL(binary, mode="speech")
    mos_same = v([clean], [clean], sr=16000)
    mos_noisy = v([clean], [noisy], sr=16000)
    assert 3.5 <= mos_same <= 5.0
    assert mos_noisy < mos_same
