"""Seed-batched decode: S chains in one while-loop must reproduce the
single-chain decoder exactly under greedy sampling."""

import jax
import numpy as np
import pytest

from ssr_speech_tpu.config import DecodeConfig, tiny_ssr_config
from ssr_speech_tpu.inference import decode
from ssr_speech_tpu.models import ssr as ssr_model

CFG = tiny_ssr_config()


@pytest.fixture(scope="module")
def params():
    return ssr_model.init_ssr(jax.random.PRNGKey(0), CFG)


@pytest.mark.parametrize("aug_text,mask", [(False, [(8, 15)]),
                                           (True, [(5, 10), (18, 24)])])
def test_batched_greedy_matches_single(params, aug_text, mask):
    rng = np.random.default_rng(7)
    ts = CFG.tokens
    y = rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, 32))
    x = rng.integers(0, CFG.text_vocab_size - 1, size=(20,))
    dec = DecodeConfig(top_k=1, top_p=1.0, stop_repetition=-1,
                       cfg_coef=1.5, cfg_stride=2, aug_text=aug_text,
                       cfg_pretrained=True, max_gen_per_span=120,
                       length_cap_mult=10)
    codes1, marks1, oi1, nm1 = decode.generate(
        params, CFG, dec, x, y, mask, jax.random.PRNGKey(0),
        dtype_name="float32",
    )
    results = decode.generate_batch(
        params, CFG, dec, x, y, mask, jax.random.PRNGKey(0), n_samples=3,
        dtype_name="float32",
    )
    assert len(results) == 3
    for codes_s, marks_s, oi_s, nm_s in results:
        np.testing.assert_array_equal(codes_s, codes1)
        np.testing.assert_array_equal(marks_s, marks1)
        assert oi_s == oi1 and nm_s == nm1


def test_batched_sampling_chains_differ(params):
    rng = np.random.default_rng(8)
    ts = CFG.tokens
    y = rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, 30))
    x = rng.integers(0, CFG.text_vocab_size - 1, size=(16,))
    dec = DecodeConfig(top_k=0, top_p=1.0, temperature=1.2,
                       stop_repetition=-1, aug_text=False,
                       max_gen_per_span=80, length_cap_mult=10)
    results = decode.generate_batch(
        params, CFG, dec, x, y, [(10, 20)], jax.random.PRNGKey(1),
        n_samples=4, dtype_name="float32",
    )
    streams = [r[0].tobytes() for r in results]
    # with pure sampling the chains should not all be identical
    assert len(set(streams)) > 1
    for codes, marks, _, _ in results:
        assert codes.shape[1] == CFG.n_codebooks
        gen = codes[0][:, marks[0] == 1]
        assert np.all(gen < ts.cardinality)
