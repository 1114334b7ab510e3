"""Tensor-parallel SERVING: the compiled decode loop over a tp mesh.

The reference has no multi-GPU inference at all (``models/ssr.py:559`` is
single-sample, single-device). Here the 830M LM's decode shards over
attention heads / FFN hidden via megatron-style specs and must produce
BIT-EXACT token streams vs the single-device path — same rng, same
constrained-sampling state machine, only the linear algebra is partitioned
(psum reductions ride the ICI on real hardware; the 8-device CPU mesh proves
the partitioning executes).
"""

import jax
import numpy as np
import pytest

from ssr_speech_tpu.config import DecodeConfig, tiny_ssr_config
from ssr_speech_tpu.inference import decode as dec_mod
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.parallel import mesh as meshlib


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_ssr_config()
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = rng.integers(0, cfg.text_vocab_size - 1, size=(24,))
    y = rng.integers(0, cfg.tokens.audio_vocab_size,
                     size=(cfg.n_codebooks, 40))
    return cfg, params, x, y


def _gen(params, cfg, dec, x, y, mask, seed=3):
    return dec_mod.generate(params, cfg, dec, x, y, mask,
                            jax.random.PRNGKey(seed), dtype_name="float32")


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_decode_token_parity(setup, tp):
    cfg, params, x, y = setup
    dec = DecodeConfig(top_k=1, top_p=0.0, stop_repetition=-1,
                       max_gen_per_span=64)
    mask = [(10, 20)]
    codes0, marks0, iv0, nm0 = _gen(params, cfg, dec, x, y, mask)
    mesh = meshlib.make_mesh(8, tp=tp)
    params_sh = meshlib.shard_params_for_serving(mesh, params)
    codes1, marks1, iv1, nm1 = _gen(params_sh, cfg, dec, x, y, mask)
    np.testing.assert_array_equal(codes0, codes1)
    np.testing.assert_array_equal(marks0, marks1)
    assert iv0 == iv1 and nm0 == nm1


def test_tp_decode_cfg_sampling_parity(setup):
    """CFG pair + stride + stochastic sampling + multi-span under tp=2."""
    cfg, params, x, y = setup
    dec = DecodeConfig(top_k=5, top_p=0.8, temperature=1.0, aug_text=True,
                       cfg_coef=1.5, cfg_stride=3, cfg_pretrained=True,
                       stop_repetition=2, max_gen_per_span=48)
    mask = [(5, 12), (20, 28)]
    codes0, marks0, iv0, _ = _gen(params, cfg, dec, x, y, mask, seed=11)
    mesh = meshlib.make_mesh(8, tp=2)
    params_sh = meshlib.shard_params_for_serving(mesh, params)
    codes1, marks1, iv1, _ = _gen(params_sh, cfg, dec, x, y, mask, seed=11)
    np.testing.assert_array_equal(codes0, codes1)
    np.testing.assert_array_equal(marks0, marks1)
    assert iv0 == iv1


def test_tp_seed_batched_decode_parity(setup):
    """The seed-batched serving loop (shared prompt cache) under tp=2."""
    cfg, params, x, y = setup
    dec = DecodeConfig(top_k=4, top_p=0.0, stop_repetition=-1,
                       max_gen_per_span=40)
    mask = [(10, 20)]
    r0 = dec_mod.generate_batch(params, cfg, dec, x, y, mask,
                                jax.random.PRNGKey(5), n_samples=4,
                                dtype_name="float32")
    mesh = meshlib.make_mesh(8, tp=2)
    params_sh = meshlib.shard_params_for_serving(mesh, params)
    r1 = dec_mod.generate_batch(params_sh, cfg, dec, x, y, mask,
                                jax.random.PRNGKey(5), n_samples=4,
                                dtype_name="float32")
    for (c0, m0, i0, n0), (c1, m1, i1, n1) in zip(r0, r1):
        np.testing.assert_array_equal(c0, c1)
        np.testing.assert_array_equal(m0, m1)
        assert i0 == i1 and n0 == n1


def test_tp_multi_prompt_decode_parity(setup):
    """Multi-prompt serving loop under tp=2 (different utterances, one loop)."""
    cfg, params, x, y = setup
    rng = np.random.default_rng(7)
    x2 = rng.integers(0, cfg.text_vocab_size - 1, size=(17,))
    y2 = rng.integers(0, cfg.tokens.audio_vocab_size,
                      size=(cfg.n_codebooks, 31))
    dec = DecodeConfig(top_k=3, top_p=0.0, stop_repetition=-1,
                       max_gen_per_span=40)
    prompts = [(x, y, [(10, 20)]), (x2, y2, [(4, 9)])]
    r0 = dec_mod.generate_multi(params, cfg, dec, prompts,
                                jax.random.PRNGKey(9), dtype_name="float32")
    mesh = meshlib.make_mesh(8, tp=2)
    params_sh = meshlib.shard_params_for_serving(mesh, params)
    r1 = dec_mod.generate_multi(params_sh, cfg, dec, prompts,
                                jax.random.PRNGKey(9), dtype_name="float32")
    for (c0, m0, i0, n0), (c1, m1, i1, n1) in zip(r0, r1):
        np.testing.assert_array_equal(c0, c1)
        np.testing.assert_array_equal(m0, m1)
        assert i0 == i1 and n0 == n1
