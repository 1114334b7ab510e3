"""aug_context on the batched / multi-prompt / served decode paths.

Round-2 VERDICT item 3: the short-span context prepend
(reference ``models/ssr.py:563-593``) used to be single-sample only; these
tests lock every front-end against ``decode.generate`` (greedy, so chains
are deterministic and bit-comparable).
"""

import jax
import numpy as np
import pytest

from ssr_speech_tpu.config import DecodeConfig, tiny_ssr_config
from ssr_speech_tpu.inference import decode, serve
from ssr_speech_tpu.models import ssr as ssr_model

CFG = tiny_ssr_config()
TS = CFG.tokens


@pytest.fixture(scope="module")
def params():
    return ssr_model.init_ssr(jax.random.PRNGKey(0), CFG)


def _mk(seed):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, TS.audio_vocab_size, size=(CFG.n_codebooks, 28))
    x = rng.integers(0, CFG.text_vocab_size - 1, size=(18,))
    prompt_y = rng.integers(0, TS.audio_vocab_size, size=(CFG.n_codebooks, 12))
    prompt_x = rng.integers(0, CFG.text_vocab_size - 1, size=(9,))
    mask = [(8, 15)]  # 7 frames < 2*codec_sr -> context activates
    return x, y, mask, prompt_x, prompt_y


def _dec(aug_text=True):
    return DecodeConfig(
        top_k=1, top_p=1.0, temperature=1.0, stop_repetition=-1,
        cfg_coef=1.5, cfg_stride=2, aug_text=aug_text, aug_context=True,
        cfg_pretrained=True, max_gen_per_span=120, length_cap_mult=10)


def _single(params, dec, req):
    x, y, mask, px, py = req
    return decode.generate(params, CFG, dec, x, y, mask, jax.random.PRNGKey(0),
                           prompt_x=px, prompt_y=py, dtype_name="float32")


def _assert_same(got, want):
    codes1, marks1, oi1, nm1 = want
    codes_s, marks_s, oi_s, nm_s = got
    np.testing.assert_array_equal(codes_s, codes1)
    np.testing.assert_array_equal(marks_s, marks1)
    assert oi_s == oi1 and nm_s == nm1


@pytest.mark.parametrize("aug_text", [False, True])
def test_batch_aug_context_matches_single(params, aug_text):
    req = _mk(11)
    dec = _dec(aug_text)
    want = _single(params, dec, req)
    x, y, mask, px, py = req
    results = decode.generate_batch(
        params, CFG, dec, x, y, mask, jax.random.PRNGKey(0), n_samples=2,
        prompt_x=px, prompt_y=py, dtype_name="float32")
    assert len(results) == 2
    for got in results:
        _assert_same(got, want)


def test_multi_aug_context_matches_single(params):
    dec = _dec(True)
    reqs = [_mk(11), _mk(12)]
    # second prompt: long span -> context must NOT activate even with prompts
    x2, y2, _, px2, py2 = reqs[1]
    reqs[1] = (x2, y2, [(2, 26)], px2, py2)
    singles = [_single(params, dec, r) for r in reqs]
    multi = decode.generate_multi(
        params, CFG, dec,
        [(r[0], r[1], r[2], r[3], r[4]) for r in reqs],
        jax.random.PRNGKey(0), dtype_name="float32")
    for got, want in zip(multi, singles):
        _assert_same(got, want)


def test_served_aug_context_matches_single(params):
    dec = _dec(True)
    reqs = [_mk(11), _mk(13)]
    singles = [_single(params, dec, r) for r in reqs]
    served = serve.serve_requests(
        params, CFG, dec,
        [(r[0], r[1], r[2], r[3], r[4]) for r in reqs],
        jax.random.PRNGKey(0), n_slots=2, dtype_name="float32")
    for got, want in zip(served, singles):
        _assert_same(got, want)


def test_three_tuple_requests_still_serve(params):
    """Plain (x, y, mask) requests (no prompts) keep working everywhere —
    aug_context silently deactivates exactly like the reference when no
    prompt is supplied."""
    dec = _dec(True)
    x, y, mask, _, _ = _mk(11)
    want = decode.generate(params, CFG, dec, x, y, mask, jax.random.PRNGKey(0),
                           dtype_name="float32")
    got = serve.serve_requests(params, CFG, dec, [(x, y, mask)],
                               jax.random.PRNGKey(0), n_slots=1,
                               dtype_name="float32")[0]
    _assert_same(got, want)
