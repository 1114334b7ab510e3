"""Phonemizer-wrapper parity with the reference, via a mock espeak backend.

espeak-ng is absent here, so these tests inject recorded espeak-style
strings (tests/mock_espeak.py) into BOTH our ``TextTokenizer`` and the
reference's (``/root/reference/data/tokenizer.py:31-83``) and assert the
parsed phone lists are identical — locking the wrapper logic (word/phone
separator splitting, punctuation preservation, stress marks, keep-flags
language switches) independently of the espeak binary.

The GigaSpeech tag round trip (reference ``data/phonemize.py:36-41,59-77``)
is locked the same way: the reference's inline ``process_one`` pipeline is
replicated verbatim here and compared against ``data/prep.gs_phonemize_text``.
"""

import pytest

from ssr_speech_tpu.data import prep
from ssr_speech_tpu.data.tokenizer import TextTokenizer

from .mock_espeak import RECORDED, MockEspeakBackend, MockSeparator
from .reference_loader import REFERENCE_ROOT, load_reference_tokenizer

pytestmark = pytest.mark.skipif(
    not REFERENCE_ROOT.is_dir(), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_tok_mod():
    return load_reference_tokenizer(MockEspeakBackend)


def our_tokenizer() -> TextTokenizer:
    tok = TextTokenizer(language="en-us")  # falls back (no phonemizer pkg)
    assert tok.backend is None
    tok.backend = MockEspeakBackend("en-us")
    tok.separator = MockSeparator(word=tok.word_sep, syllable="-",
                                  phone=tok.phone_sep)
    return tok


@pytest.fixture(scope="module")
def tokenizers(ref_tok_mod):
    ref_tok = ref_tok_mod.TextTokenizer(language="en-us")
    assert isinstance(ref_tok.backend, MockEspeakBackend)
    return ref_tok, our_tokenizer()


@pytest.mark.parametrize("text", sorted(RECORDED))
def test_phone_list_parity(tokenizers, text):
    """Identical phone lists for every recorded espeak-style output:
    multi-char phones, punctuation, stress marks, language-switch flags."""
    ref_tok, ours = tokenizers
    want = ref_tok_tokenize(ref_tok, text)
    got = ours(text)
    assert got == want
    # word/phone separators never leak into the phone fields
    assert "|" not in got


def ref_tok_tokenize(ref_tok, text):
    # reference tokenize_text (data/tokenizer.py:85-87)
    return ref_tok([text.strip()])[0]


def test_backend_construction_matches_reference(tokenizers):
    """Both wrappers configure espeak identically (punctuation preservation,
    no stress, keep-flags switches, ignored word mismatches)."""
    ref_tok, ours = tokenizers
    rb, ob = ref_tok.backend, ours.backend
    assert (rb.preserve_punctuation, ob.preserve_punctuation) == (True, True)
    assert (rb.with_stress, ob.with_stress) == (False, False)
    # our constructor path sets these on the real backend; the injected mock
    # records the defaults, which must match the reference's
    assert rb.language_switch == "keep-flags"
    assert rb.words_mismatch == "ignore"
    assert rb.tie is False


# ------------------------------------------------------- GigaSpeech round trip

def reference_process_one(ref_tok, text):
    """The reference data/phonemize.py:36-41,59-73 pipeline, replicated
    verbatim (it lives inline under ``__main__`` and cannot be imported)."""
    punc2sym = {" <COMMA>": ",", " <PERIOD>": ".", " <QUESTIONMARK>": "?",
                " <EXCLAMATIONPOINT>": "!"}
    gar2sym = {"<SIL>": "#%#", "<MUSIC>": "##%", "<NOISE>": "%%#",
               "<OTHER>": "%#%"}
    punc2sym.update(gar2sym)
    word2sym = {"h æ ʃ h ɐ ʃ p ɚ s ɛ n t": "<MUSIC>",
                "h æ ʃ p ɚ s ɛ n t h æ ʃ": "<SIL>",
                "p ɚ s ɛ n t h ɐ ʃ p ɚ s ɛ n t": "<OTHER>",
                "p ɚ s ɛ n t p ɚ s ɛ n t h æ ʃ": "<NOISE>"}
    forbidden_words = set(["#%#", "##%", "%%#", "%#%"])
    if sum(word in forbidden_words for word in text.split(" ")):
        return None
    for k, v in punc2sym.items():
        text = text.replace(k, v)
    phn = ref_tok_tokenize(ref_tok, text)
    phn_seq = " ".join(phn)
    for k, v in word2sym.items():
        phn_seq = phn_seq.replace(k, v)
    return phn_seq


@pytest.mark.parametrize("text,expect_tags", [
    ("before <MUSIC> after", ["<MUSIC>"]),
    ("start <SIL> mid <NOISE> end <OTHER>", ["<SIL>", "<NOISE>", "<OTHER>"]),
    ("so near <COMMA> to them <PERIOD> the common object", []),
])
def test_gigaspeech_round_trip_parity(tokenizers, text, expect_tags):
    """Punctuation-tag collapse + garbage-tag sentinel round trip produce
    the exact reference phoneme line, with the tags restored as tokens."""
    ref_tok, ours = tokenizers
    want = reference_process_one(ref_tok, text)
    got = prep.gs_phonemize_text(ours, text)
    assert got == want
    for tag in expect_tags:
        assert tag in got.split(" "), got


def test_gigaspeech_forbidden_transcripts_skip(tokenizers):
    ref_tok, ours = tokenizers
    text = "legit words then #%# appears"
    assert reference_process_one(ref_tok, text) is None
    assert prep.gs_phonemize_text(ours, text) is None


def test_gigaspeech_round_trip_char_fallback():
    """Without espeak the char fallback still restores the tags (our
    pipeline stays runnable end-to-end in dependency-free environments)."""
    tok = TextTokenizer(language="en-us")
    assert tok.backend is None
    got = prep.gs_phonemize_text(tok, "before <MUSIC> after")
    assert "<MUSIC>" in got.split(" ")
    assert got.split(" ").count("_") == 2
