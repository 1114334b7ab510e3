"""Randomized decode-config sweep: every batched/served front-end must
reproduce the single-chain decoder bit-exactly under greedy sampling across
a seeded random sample of the DecodeConfig x task-geometry space.

This locks the round-3 unification of the chain-advance state machine
(inference/decode.py: one `_advance_chains` shared by generate /
generate_batch / generate_multi / ContinuousBatcher) against the space of
flag combinations the reference exposes (inference_v2.py:158-188): CFG
coef/stride, aug_text, aug_context (prompt prepend), stop_repetition with
silence tokens, 1-3 edit spans or TTS continuation."""

import jax
import numpy as np
import pytest

from ssr_speech_tpu.config import DecodeConfig, tiny_ssr_config
from ssr_speech_tpu.inference import decode, serve
from ssr_speech_tpu.models import ssr as ssr_model

CFG = tiny_ssr_config()


@pytest.fixture(scope="module")
def params():
    return ssr_model.init_ssr(jax.random.PRNGKey(0), CFG)


def _random_case(rng):
    """One random (dec, x, y, mask, prompt_x, prompt_y) tuple."""
    ts = CFG.tokens
    dec = DecodeConfig(
        top_k=1, top_p=1.0,  # greedy: exactness is the property under test
        stop_repetition=int(rng.choice([-1, 2, 3])),
        silence_tokens=tuple(
            int(v) for v in rng.choice(ts.cardinality, size=2,
                                       replace=False)),
        cfg_coef=float(rng.choice([1.0, 1.5, 2.0])),
        cfg_stride=int(rng.choice([1, 2, 3, 5])),
        aug_text=bool(rng.integers(2)),
        aug_context=bool(rng.integers(2)),
        cfg_pretrained=True,  # deterministic uncond rows == cross-path parity
        max_gen_per_span=60,
        length_cap_mult=10,
    )
    T = int(rng.integers(16, 40))
    x = rng.integers(0, CFG.text_vocab_size - 1,
                     size=(int(rng.integers(12, 30)),))
    y = rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, T))
    if rng.integers(3) == 0:
        mask = [(T, T)]  # TTS continuation
    else:
        n_spans = int(rng.integers(1, 4))
        # sorted distinct cut points => strictly increasing, non-overlapping
        cuts = np.sort(rng.choice(np.arange(1, T - 1), size=2 * n_spans,
                                  replace=False))
        mask = [(int(cuts[2 * i]), int(cuts[2 * i + 1]))
                for i in range(n_spans)]
    # prompt context (activates only when dec.aug_context and the masked
    # content is < 2 s — both taken and not-taken branches get sampled)
    prompt_x = rng.integers(0, CFG.text_vocab_size - 1, size=(6,))
    prompt_y = rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, 7))
    return dec, x, y, mask, prompt_x, prompt_y


def _assert_same(got, want, label):
    codes_w, marks_w, oi_w, nm_w = want
    codes_g, marks_g, oi_g, nm_g = got
    np.testing.assert_array_equal(codes_g, codes_w, err_msg=label)
    np.testing.assert_array_equal(marks_g, marks_w, err_msg=label)
    assert oi_g == oi_w and nm_g == nm_w, label


@pytest.mark.slow
@pytest.mark.parametrize("trial", range(5))
def test_random_config_cross_path_parity(params, trial):
    rng = np.random.default_rng(1000 + trial)
    dec, x, y, mask, px, py = _random_case(rng)
    key = jax.random.PRNGKey(0)

    want = decode.generate(params, CFG, dec, x, y, mask, key,
                           prompt_x=px, prompt_y=py, dtype_name="float32")

    for r in decode.generate_batch(params, CFG, dec, x, y, mask, key, 2,
                                   prompt_x=px, prompt_y=py,
                                   dtype_name="float32"):
        _assert_same(r, want, f"trial {trial}: generate_batch vs single")

    # a second, independent random prompt batches alongside the trial one
    dec2_case = _random_case(np.random.default_rng(5000 + trial))
    _, x2, y2, mask2, px2, py2 = dec2_case
    want2 = decode.generate(params, CFG, dec, x2, y2, mask2, key,
                            prompt_x=px2, prompt_y=py2, dtype_name="float32")
    multi = decode.generate_multi(
        params, CFG, dec,
        [(x, y, mask, px, py), (x2, y2, mask2, px2, py2)],
        key, dtype_name="float32")
    _assert_same(multi[0], want, f"trial {trial}: generate_multi[0]")
    _assert_same(multi[1], want2, f"trial {trial}: generate_multi[1]")

    served = serve.serve_requests(
        params, CFG, dec,
        [(x, y, mask, px, py), (x2, y2, mask2, px2, py2)],
        key, n_slots=2, dtype_name="float32")
    _assert_same(served[0], want, f"trial {trial}: served[0]")
    _assert_same(served[1], want2, f"trial {trial}: served[1]")
