"""Tiny-config tests for the SSR LM forward pass and the compiled decode loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssr_speech_tpu.config import DecodeConfig, tiny_ssr_config
from ssr_speech_tpu.inference import decode
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.models import transformer as trf
from ssr_speech_tpu.ops import patterns
from ssr_speech_tpu.ops.masking import xy_attn_bias


CFG = tiny_ssr_config()


@pytest.fixture(scope="module")
def params():
    return ssr_model.init_ssr(jax.random.PRNGKey(0), CFG)


def make_batch(rng, B=2, sx=12, sy=40):
    ts = CFG.tokens
    x = rng.integers(0, CFG.text_vocab_size, size=(B, sx))
    x_lens = rng.integers(sx // 2, sx + 1, size=(B,))
    y_lens = np.zeros(B, np.int64)
    ys = np.full((B, sy, CFG.n_codebooks), ts.pad, np.int64)
    for b in range(B):
        t = int(rng.integers(10, 20))
        raw = rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, t))
        mask = [(2, 5)]
        cated, _ = patterns.build_lm_sequence(raw, mask, ts)
        L = min(cated.shape[1], sy)
        ys[b, :L] = cated.T[:L]
        y_lens[b] = L
    for b in range(B):
        x[b, x_lens[b]:] = CFG.text_pad_token
    return dict(
        x=jnp.asarray(x), x_lens=jnp.asarray(x_lens),
        y=jnp.asarray(ys), y_lens=jnp.asarray(y_lens),
    )


@pytest.mark.slow
def test_forward_shapes_and_finite(params):
    batch = make_batch(np.random.default_rng(0))
    out = ssr_model.ssr_forward(params, CFG, batch)
    assert np.isfinite(float(out["loss"]))
    assert out["loss_by_codebook"].shape == (CFG.n_codebooks,)
    assert float(out["effective_ntoken"]) > 0


@pytest.mark.slow
def test_forward_invariant_to_padding(params):
    """Extending pad must not change the loss (mask correctness)."""
    batch = make_batch(np.random.default_rng(1))
    out1 = ssr_model.ssr_forward(params, CFG, batch)
    ts = CFG.tokens
    pad_x = jnp.full((batch["x"].shape[0], 7), CFG.text_pad_token, batch["x"].dtype)
    pad_y = jnp.full(
        (batch["y"].shape[0], 9, CFG.n_codebooks), ts.pad, batch["y"].dtype
    )
    batch2 = dict(
        x=jnp.concatenate([batch["x"], pad_x], axis=1),
        x_lens=batch["x_lens"],
        y=jnp.concatenate([batch["y"], pad_y], axis=1),
        y_lens=batch["y_lens"],
    )
    out2 = ssr_model.ssr_forward(params, CFG, batch2)
    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]), rtol=2e-4)


@pytest.mark.slow
def test_prefill_matches_full_forward(params):
    """Cached decode must reproduce the full (uncached) forward output."""
    rng = np.random.default_rng(2)
    sx, P = 9, 17
    x = jnp.asarray(rng.integers(0, CFG.text_vocab_size, size=(1, sx)))
    y_prefix = jnp.asarray(rng.integers(0, CFG.tokens.audio_vocab_size, size=(CFG.n_codebooks, P)))

    tmax = sx + P + 8
    cache, key_banned = decode._prefill_impl(
        params, x, y_prefix,
        jnp.asarray(sx, jnp.int32), jnp.asarray(P, jnp.int32),
        cfg=CFG, tmax=tmax, dtype_name="float32",
    )
    assert int(cache.length) == sx + P

    # full forward for comparison
    pe = ssr_model.sine_table(CFG.max_position, CFG.d_model)
    x_h = ssr_model.embed_text(params, CFG, x, pe)
    y_h = ssr_model.embed_audio_tokens(params, CFG, y_prefix.T[None])
    y_h = ssr_model.apply_audio_pos(params, y_h, pe, 0)
    h = jnp.concatenate([x_h, y_h], axis=1)
    bias = xy_attn_bias(jnp.asarray([sx]), jnp.asarray([P]), sx, P)
    full = trf.transformer_forward(params["decoder"], h, bias, CFG, dtype=jnp.float32)

    # one cached step with the next token must equal running full forward
    # with that token appended
    tok = jnp.asarray([3, 1, 4, 1], jnp.int32)[: CFG.n_codebooks]
    h_t = decode._embed_step_tokens(params, CFG, tok, pe, P, 1, jnp.float32)
    out_step, cache2 = trf.transformer_decode_step(
        params["decoder"], h_t, cache, key_banned, CFG, dtype=jnp.float32
    )

    y2 = jnp.concatenate([y_prefix, tok[:, None]], axis=1)
    y2_h = ssr_model.embed_audio_tokens(params, CFG, y2.T[None])
    y2_h = ssr_model.apply_audio_pos(params, y2_h, pe, 0)
    h2 = jnp.concatenate([x_h, y2_h], axis=1)
    bias2 = xy_attn_bias(jnp.asarray([sx]), jnp.asarray([P + 1]), sx, P + 1)
    full2 = trf.transformer_forward(params["decoder"], h2, bias2, CFG, dtype=jnp.float32)

    np.testing.assert_allclose(
        np.asarray(out_step[0]), np.asarray(full2[0, -1]), rtol=5e-4, atol=5e-5
    )


@pytest.mark.parametrize("aug_text,num_spans", [(False, 1), (True, 1), (True, 2)])
def test_generate_end_to_end(params, aug_text, num_spans):
    rng = np.random.default_rng(4)
    ts = CFG.tokens
    T = 40
    y = rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, T))
    x = rng.integers(0, CFG.text_vocab_size, size=(24,))
    if num_spans == 1:
        mask = [(10, 20)]
    else:
        mask = [(5, 12), (20, 30)]
    dec = DecodeConfig(
        aug_text=aug_text, cfg_stride=2, top_k=5, top_p=1.0,
        max_gen_per_span=60, length_cap_mult=10,
    )
    codes, marks, out_iv, nm = decode.generate(
        params, CFG, dec, x, y, mask, jax.random.PRNGKey(0)
    )
    assert codes.shape[0] == 1 and codes.shape[1] == CFG.n_codebooks
    assert marks.shape[1] == codes.shape[2]
    # original segments must be copied through exactly
    for (s, e), (os_, oe) in zip(out_iv, nm):
        np.testing.assert_array_equal(codes[0, :, s:e], y[:, os_:oe])
        assert np.all(marks[0, s:e] == 0)
    # generated regions are marked 1 and contain only real codec tokens
    gen_region = codes[0][:, marks[0] == 1]
    assert np.all(gen_region < ts.cardinality)
    assert np.all(gen_region >= 0)


def test_generate_deterministic_under_seed(params):
    rng = np.random.default_rng(5)
    ts = CFG.tokens
    y = rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, 30))
    x = rng.integers(0, CFG.text_vocab_size, size=(16,))
    dec = DecodeConfig(aug_text=False, top_k=8, max_gen_per_span=50)
    out1 = decode.generate(params, CFG, dec, x, y, [(8, 15)], jax.random.PRNGKey(42))
    out2 = decode.generate(params, CFG, dec, x, y, [(8, 15)], jax.random.PRNGKey(42))
    np.testing.assert_array_equal(out1[0], out2[0])


def test_generate_rejects_overlong_positions():
    """A PROMPT whose padded prefix exceeds the sine positional table fails
    with an actionable error instead of a cryptic dynamic-slice failure
    (generation past the table only clips + warns; the prefill embed is the
    hard limit)."""
    import dataclasses

    from ssr_speech_tpu.config import DecodeConfig
    from ssr_speech_tpu.inference import decode as dec_mod

    cfg = dataclasses.replace(tiny_ssr_config(), max_position=64)
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    y = rng.integers(0, cfg.tokens.audio_vocab_size,
                     size=(cfg.n_codebooks, 50))
    x = rng.integers(0, cfg.text_vocab_size - 1, size=(10,))
    dec = DecodeConfig(top_k=1, stop_repetition=-1, max_gen_per_span=40)
    with pytest.raises(ValueError, match="max_position"):
        dec_mod.generate(params, cfg, dec, x, y, [(10, 20)],
                         jax.random.PRNGKey(0), dtype_name="float32")
