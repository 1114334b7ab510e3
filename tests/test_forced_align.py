"""CTC forced alignment: trellis math and word grouping (model-free).

The wav2vec2 emission producer is a gated host dep; the alignment itself is
pure numpy and is locked here with synthetic emissions whose true alignment
is known by construction.
"""

import numpy as np
import pytest

from ssr_speech_tpu.utils.forced_align import (
    ctc_forced_align,
    tokens_to_word_times,
)


def _emissions(path, V, strength=8.0):
    """Log-prob matrix peaked on ``path`` (a token id per frame)."""
    T = len(path)
    logits = np.zeros((T, V))
    for t, tok in enumerate(path):
        logits[t, tok] = strength
    e = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    return e


def test_ctc_align_recovers_known_path():
    # blank=0; target "1 2 3" emitted as 1 1 0 2 2 2 0 0 3
    path = [1, 1, 0, 2, 2, 2, 0, 0, 3]
    lp = _emissions(path, V=5)
    spans = ctc_forced_align(lp, [1, 2, 3], blank=0)
    assert spans == [(0, 2), (3, 6), (8, 9)]


def test_ctc_align_repeated_token_needs_blank():
    # "1 1" must pass through a blank between the two occurrences
    path = [1, 1, 0, 1, 1]
    lp = _emissions(path, V=3)
    spans = ctc_forced_align(lp, [1, 1], blank=0)
    assert spans == [(0, 2), (3, 5)]


def test_ctc_align_skip_transition():
    # distinct consecutive tokens may omit the blank entirely
    path = [1, 2, 3]
    lp = _emissions(path, V=5)
    spans = ctc_forced_align(lp, [1, 2, 3], blank=0)
    assert spans == [(0, 1), (1, 2), (2, 3)]


def test_ctc_align_noisy_emissions():
    rng = np.random.default_rng(0)
    path = [0, 0, 1, 1, 1, 0, 2, 2, 0, 0, 3, 3, 3, 0]
    lp = _emissions(path, V=6, strength=6.0)
    lp = lp + rng.normal(scale=0.5, size=lp.shape)
    lp = lp - np.log(np.exp(lp).sum(axis=1, keepdims=True))
    spans = ctc_forced_align(lp, [1, 2, 3], blank=0)
    # ordered, non-overlapping, roughly where planted
    assert spans[0][0] >= 0 and spans[0][1] <= spans[1][0] + 1
    assert 1 <= spans[0][0] <= 3 and 5 <= spans[1][0] <= 7
    assert 9 <= spans[2][0] <= 11


def test_tokens_to_word_times():
    # "hi|yo": char tokens h i | y o with frame spans
    spans = [(0, 2), (2, 3), (3, 4), (5, 6), (6, 8)]
    toks = list("hi|yo")
    words = tokens_to_word_times(spans, toks, sec_per_frame=0.02)
    assert [w for w, _, _ in words] == ["hi", "yo"]
    assert words[0][1] == pytest.approx(0.0)
    assert words[0][2] == pytest.approx(0.06)
    assert words[1][1] == pytest.approx(0.10)
    assert words[1][2] == pytest.approx(0.16)


def test_ctc_align_matches_torch_forced_align():
    """Cross-check the trellis against torchaudio's forced_align when the
    torch implementation is available (same Viterbi topology)."""
    torchaudio = pytest.importorskip("torchaudio")
    import torch

    if not hasattr(torchaudio.functional, "forced_align"):
        pytest.skip("torchaudio without forced_align")
    rng = np.random.default_rng(3)
    T, V = 40, 8
    lp = rng.normal(size=(T, V))
    lp = lp - np.log(np.exp(lp).sum(axis=1, keepdims=True))
    tokens = [2, 5, 1, 1, 7]
    got = ctc_forced_align(lp, tokens, blank=0)
    want_path, _ = torchaudio.functional.forced_align(
        torch.from_numpy(lp[None]).float(),
        torch.tensor([tokens]), blank=0)
    want_path = want_path[0].numpy()
    for j, tok in enumerate(tokens):
        # occurrences of token j in the torch path, split by occurrence index
        frames = [t for t in range(T) if want_path[t] == tok]
        # our span for occurrence j must be inside the torch frame set
        s, e = got[j]
        for t in range(s, e):
            assert want_path[t] == tok
