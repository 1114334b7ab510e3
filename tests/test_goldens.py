"""Golden-token regression: decode outputs for fixed seeds must stay
bit-identical across refactors (the golden-capture harness SURVEY §6 calls
for — here capturing OUR reference runs, since the upstream publishes none).

Regenerate with the snippet in this file's git history if an INTENTIONAL
sampling-semantics change occurs; never regenerate to paper over a diff.
"""

import os

import jax
import numpy as np
import pytest

from ssr_speech_tpu.config import DecodeConfig, tiny_ssr_config
from ssr_speech_tpu.inference import decode
from ssr_speech_tpu.models import ssr as ssr_model

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "decode_tokens.npz")
CFG = tiny_ssr_config()

CASES = {
    "sampling_topk8": (
        DecodeConfig(aug_text=False, top_k=8, top_p=1.0, temperature=1.0,
                     stop_repetition=-1, max_gen_per_span=80, length_cap_mult=10),
        [(10, 20)],
    ),
    "cfg_topp": (
        DecodeConfig(aug_text=True, cfg_stride=3, cfg_coef=1.5,
                     cfg_pretrained=True, top_k=0, top_p=0.9,
                     stop_repetition=-1, max_gen_per_span=80, length_cap_mult=10),
        [(6, 12), (20, 28)],
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_decode_tokens(name):
    data = np.load(GOLDEN)
    params = ssr_model.init_ssr(jax.random.PRNGKey(123), CFG)
    dec, mask = CASES[name]
    codes, marks, _, _ = decode.generate(
        params, CFG, dec, data["x"], data["y"], mask, jax.random.PRNGKey(7),
        dtype_name="float32",
    )
    np.testing.assert_array_equal(codes, data[name + "_codes"])
    np.testing.assert_array_equal(marks, data[name + "_marks"])
