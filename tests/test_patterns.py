"""Tests for token-pattern ops against a straightforward loop reference
(mirroring the loops of reference models/ssr.py:408-464)."""

import numpy as np
import pytest

from ssr_speech_tpu.config import MaskingConfig, TokenSpace
from ssr_speech_tpu.ops import patterns


TS = TokenSpace(audio_vocab_size=32)


def loop_delay(tokens, K, special):
    T = tokens.shape[1]
    out = np.full((K, T + K - 1), special, dtype=tokens.dtype)
    for t in range(T):
        for q in range(K):
            out[q, t + q] = tokens[q, t]
    return out


def test_delay_pattern_matches_loop():
    rng = np.random.default_rng(0)
    for T in [1, 2, 5, 37]:
        tok = rng.integers(0, 32, size=(4, T))
        fast = patterns.delay_pattern(tok, TS.empty)
        slow = loop_delay(tok, 4, TS.empty)
        np.testing.assert_array_equal(fast, slow)


def test_delay_roundtrip():
    rng = np.random.default_rng(1)
    tok = rng.integers(0, 32, size=(4, 50))
    shifted = patterns.delay_pattern(tok, TS.empty)
    back = patterns.revert_delay_pattern(shifted)
    np.testing.assert_array_equal(back, tok)


def test_revert_delay_jnp_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    tok = rng.integers(0, 32, size=(4, 13))
    shifted = patterns.delay_pattern(tok, TS.empty)
    out = np.asarray(patterns.revert_delay_jnp(jnp.asarray(shifted), jnp=jnp))
    np.testing.assert_array_equal(out, patterns.revert_delay_pattern(shifted))


def test_non_mask_intervals():
    assert patterns.non_mask_intervals([(5, 9), (19, 29)], 30) == [
        (0, 5),
        (9, 19),
        (29, 30),
    ]


def test_rearrange_sentinels():
    y = np.arange(4 * 30).reshape(4, 30) % 32
    mask = [(5, 9), (19, 29)]
    nm = patterns.non_mask_intervals(mask, 30)
    segs = patterns.rearrange_spans(y, mask, nm, TS)
    assert len(segs) == 5
    # first segment: sos + y[:, 0:5]
    assert segs[0].shape[1] == 6 and segs[0][0, 0] == TS.sos
    np.testing.assert_array_equal(segs[0][:, 1:], y[:, 0:5])
    # last non-mask: y[:, 29:30] + eos
    assert segs[2][0, -1] == TS.eos and segs[2].shape[1] == 2
    # masked segments end with eog
    assert segs[3][0, -1] == TS.eog
    np.testing.assert_array_equal(segs[3][:, :-1], y[:, 5:9])


def test_rearrange_empty_boundaries():
    y = np.ones((4, 10), dtype=np.int64)
    # tts-style: mask to the very end; first non-mask starts at 0
    mask = [(4, 10)]
    nm = patterns.non_mask_intervals(mask, 10)
    segs = patterns.rearrange_spans(y, mask, nm, TS)
    # last non-mask interval (10, 10) -> bare eos
    assert segs[1].shape == (4, 1) and segs[1][0, 0] == TS.eos


def test_build_lm_sequence_layout():
    y = np.arange(4 * 30).reshape(4, 30) % 32
    mask = [(5, 9)]
    cated, pos = patterns.build_lm_sequence(y, mask, TS)
    # pieces: sos+5 shifted(+3) | m0 | 21+eos shifted(+3) | m0 | 4+eog shifted(+3)
    assert len(pos) == 2
    assert pos[0] == 6 + 3
    assert cated[0, pos[0]] == TS.mts
    assert cated[0, pos[1]] == TS.mts
    assert cated.shape[1] == (6 + 3) + 1 + (22 + 3) + 1 + (5 + 3)


def test_build_inference_prefix_truncation():
    y = np.arange(4 * 30).reshape(4, 30) % 32
    mask = [(5, 9), (19, 29)]
    prefix, pos, num_task, nm = patterns.build_inference_prefix(y, mask, TS)
    assert num_task == 2
    assert prefix.shape[1] == pos[2]
    # prefix must end right before the first tail sentinel
    cated, _ = patterns.build_lm_sequence(y, mask, TS)
    np.testing.assert_array_equal(prefix, cated[:, : pos[2]])


def test_sample_mask_intervals_properties():
    cfg = MaskingConfig()
    rng = np.random.default_rng(3)
    for y_len in [120, 500, 999]:
        for _ in range(50):
            mask, nm = patterns.sample_mask_intervals(rng, y_len, cfg)
            assert 1 <= len(mask) <= cfg.max_n_spans
            prev_end = -1
            for s, e in mask:
                assert 0 <= s < e <= y_len
                assert s > prev_end
                prev_end = e
            assert nm == patterns.non_mask_intervals(mask, y_len)


def test_splice_generated():
    y = np.arange(4 * 20).reshape(4, 20) % 32
    mask = [(5, 9)]
    nm = patterns.non_mask_intervals(mask, 20)
    gen = [np.full((4, 7), 31)]
    codes, marks, out_iv = patterns.splice_generated(y, nm, gen, 20)
    assert codes.shape == (1, 4, 5 + 7 + 11)
    np.testing.assert_array_equal(codes[0, :, :5], y[:, :5])
    np.testing.assert_array_equal(codes[0, :, 5:12], gen[0])
    np.testing.assert_array_equal(codes[0, :, 12:], y[:, 9:20])
    np.testing.assert_array_equal(marks[0], [0] * 5 + [1] * 7 + [0] * 11)
    assert out_iv == [(0, 5), (12, 23)]
