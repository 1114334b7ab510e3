"""A mock espeak/phonemizer backend emitting RECORDED espeak-style strings.

espeak-ng + the ``phonemizer`` package are absent from this environment, so
the phonemizer-wrapper semantics (punctuation preservation, ``_``/``|``
separators, stress marks, language-switch flags, GigaSpeech sentinel words)
are locked by replaying recorded espeak-shaped outputs through BOTH our
``TextTokenizer`` and the reference's (``/root/reference/data/tokenizer.py:
31-83``) and asserting identical phone lists.

The recordings use the exact separator convention the wrappers configure
(``Separator(word="_", syllable="-", phone="|")``, ``strip=True``) and the
espeak-ng en-us phone inventory: multi-char phones (``aɪ``, ``tʃ``, ``əʊ``),
optional primary-stress marks (``ˈ``, U+02C8, a \\w character), punctuation
re-attached to its word by ``preserve_punctuation``, and ``keep-flags``
language-switch markers ``(en)…(en)``.
"""

from __future__ import annotations

from typing import List

WORD = "_"
PHONE = "|"

# text -> phonemized string (as EspeakBackend.phonemize()[0] would return)
RECORDED = {
    # plain words, multi-char phones
    "but when i had approached":
        "b|ʌ|t_w|ɛ|n_aɪ_h|ɐ|d_ɐ|p|ɹ|əʊ|tʃ|t",
    # preserve_punctuation: marks re-attached to their word
    "hello, world.":
        "h|ə|l|oʊ|,_w|ɜː|l|d|.",
    "is that so? yes!":
        "ɪ|z_ð|æ|t_s|oʊ|?_j|ɛ|s|!",
    # with_stress=True inventory (ˈ is a modifier letter => \w)
    "approached the marks":
        "ɐ|p|ɹ|ˈəʊ|tʃ|t_ð|ə_m|ˈɑː|ɹ|k|s",
    # keep-flags language switch markers
    "ni hao hello ma":
        "n|iː_h|aʊ_(en)h|ə|l|oʊ(en)_m|ɑː",
    # single word
    "speech": "s|p|iː|tʃ",
    # GigaSpeech sentinel words rendered by espeak (hash/percent). Each
    # sentinel is one input word and renders as one contiguous phone run —
    # the reference's word2sym keys (data/phonemize.py:41) contain no word
    # separators, so the restoration only fires on contiguous renderings.
    "before ##% after":
        "b|ɪ|f|ɔː|ɹ_h|æ|ʃ|h|ɐ|ʃ|p|ɚ|s|ɛ|n|t_æ|f|t|ɚ",
    "start #%# mid %%# end %#%":
        "s|t|ɑː|ɹ|t_h|æ|ʃ|p|ɚ|s|ɛ|n|t|h|æ|ʃ_m|ɪ|d_"
        "p|ɚ|s|ɛ|n|t|p|ɚ|s|ɛ|n|t|h|æ|ʃ_ɛ|n|d_"
        "p|ɚ|s|ɛ|n|t|h|ɐ|ʃ|p|ɚ|s|ɛ|n|t",
    # punctuation-tag collapse result ("word <COMMA> next" -> "word, next")
    "so near, to them. the common object":
        "s|oʊ_n|ɪ|ɹ|,_t|ə_ð|ɛ|m|._ð|ə_k|ɑː|m|ə|n_ɑː|b|dʒ|ɛ|k|t",
}


class MockSeparator:
    """Shape-compatible stand-in for phonemizer.separator.Separator."""

    def __init__(self, word="_", syllable="-", phone="|"):
        self.word = word
        self.syllable = syllable
        self.phone = phone


class MockEspeakBackend:
    """Records constructor kwargs; replays RECORDED strings on phonemize."""

    instances: List["MockEspeakBackend"] = []

    def __init__(self, language="en-us", punctuation_marks=None,
                 preserve_punctuation=True, with_stress=False, tie=False,
                 language_switch="keep-flags", words_mismatch="ignore"):
        self.language = language
        self.punctuation_marks = punctuation_marks
        self.preserve_punctuation = preserve_punctuation
        self.with_stress = with_stress
        self.tie = tie
        self.language_switch = language_switch
        self.words_mismatch = words_mismatch
        MockEspeakBackend.instances.append(self)

    def phonemize(self, texts, separator=None, strip=True, njobs=1):
        assert strip, "both wrappers phonemize with strip=True"
        if separator is not None:
            assert separator.word == WORD and separator.phone == PHONE, (
                separator.word, separator.phone)
        out = []
        for t in texts:
            t = t.strip()
            if t not in RECORDED:
                raise KeyError(f"no recorded espeak output for {t!r}")
            out.append(RECORDED[t])
        return out
