"""ops/sampling torch parity: top_k_top_p_filter vs the reference
``top_k_top_p_filtering`` (models/ssr.py:26-68) on random logits across the
filter space, plus sample_tokens semantics (the ``topk_sampling`` analog,
models/ssr.py:71-86)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssr_speech_tpu.ops import sampling

from .reference_loader import load_reference_lm, reference_available


@pytest.fixture(scope="module")
def ref_filter():
    if not reference_available():
        pytest.skip("reference checkout not present")
    return load_reference_lm().ssr.top_k_top_p_filtering


@pytest.mark.parametrize("top_k,top_p", [(0, 1.0), (5, 1.0), (1, 1.0),
                                         (0, 0.8), (0, 0.3), (10, 0.6),
                                         (200, 0.95)])
def test_filter_matches_reference(ref_filter, top_k, top_p):
    import torch

    rng = np.random.default_rng(42)
    logits = rng.normal(size=(4, 50)).astype(np.float32) * 3
    want = ref_filter(torch.from_numpy(logits.copy()), top_k=top_k,
                      top_p=top_p).numpy()
    got = np.asarray(sampling.top_k_top_p_filter(
        jnp.asarray(logits), top_k=top_k, top_p=top_p))
    # -inf filter sentinels compare equal; kept logits are bitwise equal
    np.testing.assert_array_equal(np.isinf(got), np.isinf(want))
    np.testing.assert_allclose(got[~np.isinf(got)], want[~np.isinf(want)],
                               atol=1e-6)


def test_sample_tokens_greedy_and_support():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(6, 40)).astype(np.float32) * 2)
    # top_k=1 is argmax regardless of key
    tok = sampling.sample_tokens(jax.random.PRNGKey(3), logits, top_k=1)
    np.testing.assert_array_equal(np.asarray(tok),
                                  np.asarray(jnp.argmax(logits, -1)))
    # nucleus sampling only ever draws from the kept support
    kept = np.asarray(sampling.top_k_top_p_filter(logits, top_p=0.5))
    for seed in range(20):
        tok = np.asarray(sampling.sample_tokens(
            jax.random.PRNGKey(seed), logits, top_p=0.5))
        assert np.all(np.isfinite(kept[np.arange(6), tok])), seed
    # temperature scales before filtering: very low temp concentrates on
    # the argmax even with permissive top_p
    tok = sampling.sample_tokens(jax.random.PRNGKey(7), logits,
                                 top_p=0.999, temperature=1e-4)
    np.testing.assert_array_equal(np.asarray(tok),
                                  np.asarray(jnp.argmax(logits, -1)))
