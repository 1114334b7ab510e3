"""Digit->words normalization (reference inference_v2.py:45-53)."""

import numpy as np
import pytest

from ssr_speech_tpu.utils.text_norm import (
    normalize_aligned_words,
    num_to_words_en,
    replace_numbers_with_words,
)


@pytest.mark.parametrize("n,expected", [
    (0, "zero"),
    (7, "seven"),
    (15, "fifteen"),
    (20, "twenty"),
    (42, "forty-two"),
    (100, "one hundred"),
    (105, "one hundred and five"),
    (999, "nine hundred and ninety-nine"),
    (1000, "one thousand"),
    (1234, "one thousand, two hundred and thirty-four"),
    (2024, "two thousand and twenty-four"),
    (100000, "one hundred thousand"),
    (123456, "one hundred and twenty-three thousand, four hundred and fifty-six"),
    (1000000, "one million"),
    (1234567, "one million, two hundred and thirty-four thousand, "
              "five hundred and sixty-seven"),
    (1000000000, "one billion"),
])
def test_num_to_words_en(n, expected):
    # expected strings are num2words(n) outputs (the reference's library)
    assert num_to_words_en(n) == expected


def test_replace_numbers_with_words_matches_reference_regex():
    # the reference space-pads digit runs first, so "file42x" splits
    out = replace_numbers_with_words("i have 42 apples")
    assert "forty-two" in out and "42" not in out
    out = replace_numbers_with_words("room101")
    assert "one hundred and one" in out
    # no digits: unchanged
    assert replace_numbers_with_words("hello world") == "hello world"


def test_normalize_aligned_words_splits_interval():
    words = [("i", 0.0, 0.2), ("have", 0.2, 0.5), ("42", 0.5, 1.1),
             ("apples", 1.1, 1.6)]
    out = normalize_aligned_words(words)
    texts = [w for w, _, _ in out]
    assert texts == ["i", "have", "forty-two", "apples"]
    # hyphenated single word keeps the whole interval
    assert out[2][1] == pytest.approx(0.5) and out[2][2] == pytest.approx(1.1)

    out2 = normalize_aligned_words([("105", 1.0, 2.0)])
    assert [w for w, _, _ in out2] == ["one", "hundred", "and", "five"]
    assert out2[0][1] == pytest.approx(1.0)
    assert out2[-1][2] == pytest.approx(2.0)
    # contiguous, monotone sub-intervals
    for (a, b), (c, d) in zip([(s, e) for _, s, e in out2[:-1]],
                              [(s, e) for _, s, e in out2[1:]]):
        assert b == pytest.approx(c) and a < b


def test_text_to_ids_hard_fails_on_alphabet_mismatch():
    from ssr_speech_tpu.data.tokenizer import TextTokenizer
    from ssr_speech_tpu.inference.pipeline import text_to_ids

    tok = TextTokenizer()
    # phn2num that matches NOTHING the tokenizer emits (a "real" espeak
    # bundle seen by the char fallback, or vice versa)
    phn2num = {"ZZ_NOT_A_PHONE": 0}
    with pytest.raises(RuntimeError, match="phn2num"):
        text_to_ids(tok, phn2num, "hello there general")

    # full-coverage vocab still works (the test-bundle path)
    phones = tok("hello there")
    phn2num = {p: i for i, p in enumerate(dict.fromkeys(phones))}
    ids = text_to_ids(tok, phn2num, "hello there")
    assert ids.dtype == np.int32 and ids.size == len(phones)
