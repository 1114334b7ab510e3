"""Multi-prompt batched decode: different utterances in one loop must match
per-prompt single decodes exactly under greedy sampling."""

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


@pytest.mark.parametrize("aug_text", [False, True])
def test_multi_prompt_greedy_matches_single(params, aug_text):
    rng = np.random.default_rng(21)
    ts = CFG.tokens
    prompts = []
    for i, (T, sx, mask) in enumerate([(30, 20, [(8, 15)]),
                                       (24, 14, [(5, 12)]),
                                       (36, 25, [(20, 30)])]):
        y = rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, T))
        x = rng.integers(0, CFG.text_vocab_size - 1, size=(sx,))
        prompts.append((x, y, mask))

    dec = DecodeConfig(top_k=1, top_p=1.0, stop_repetition=-1,
                       cfg_coef=1.5, cfg_stride=2, aug_text=aug_text,
                       cfg_pretrained=True, max_gen_per_span=120,
                       length_cap_mult=10)
    multi = decode.generate_multi(params, CFG, dec, prompts,
                                  jax.random.PRNGKey(0), dtype_name="float32")
    assert len(multi) == 3
    for (x, y, mask), (codes_m, marks_m, oi_m, nm_m) in zip(prompts, multi):
        codes_1, marks_1, oi_1, nm_1 = decode.generate(
            params, CFG, dec, x, y, mask, jax.random.PRNGKey(0),
            dtype_name="float32",
        )
        np.testing.assert_array_equal(codes_m, codes_1)
        np.testing.assert_array_equal(marks_m, marks_1)
        assert oi_m == oi_1 and nm_m == nm_1
