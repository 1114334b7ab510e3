"""Streaming TTS: incrementally yielded codes/waveform must equal the
offline generate -> causal decode -> crop pipeline exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssr_speech_tpu.config import (
    CodecConfig, DecodeConfig, RVQConfig, SEANetConfig, tiny_ssr_config,
)
from ssr_speech_tpu.inference import decode, stream
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.models.codec import quantize as q
from ssr_speech_tpu.models.codec import seanet
from ssr_speech_tpu.models.codec import wmencodec as wm

CFG = tiny_ssr_config()
CODEC = CodecConfig(
    seanet=SEANetConfig(dimension=16, n_filters=2, n_residual_layers=1,
                        ratios=(4, 2), lstm=1, norm="weight_norm",
                        causal=True, pad_mode="constant"),
    rvq=RVQConfig(dimension=16, n_q=CFG.n_codebooks,
                  bins=CFG.tokens.audio_vocab_size),
)


@pytest.fixture(scope="module")
def models():
    lm = ssr_model.init_ssr(jax.random.PRNGKey(0), CFG)
    codec = wm.init_wmencodec(jax.random.PRNGKey(1), CODEC)
    return lm, codec


@pytest.mark.parametrize("chunk_frames", [5, 16])
def test_stream_tts_matches_offline(models, chunk_frames):
    lm, codec = models
    rng = np.random.default_rng(3)
    ts = CFG.tokens
    T, sx = 24, 40
    y = rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, T))
    x = rng.integers(0, CFG.text_vocab_size - 1, size=(sx,))
    dec_cfg = DecodeConfig(top_k=1, top_p=1.0, stop_repetition=-1,
                           cfg_coef=1.5, cfg_stride=2, aug_text=True,
                           cfg_pretrained=True, max_gen_per_span=80,
                           length_cap_mult=10)

    streamer = stream.TTSStreamer(lm, CFG, dec_cfg, codec, CODEC,
                                  chunk_frames=chunk_frames, sx_pad=64,
                                  p_pad=64, dtype_name="float32")
    chunks = list(streamer.stream(x, y, jax.random.PRNGKey(0)))
    assert chunks, "stream yielded nothing"
    got_codes = np.concatenate([c for c, _ in chunks], axis=1)
    got_wav = np.concatenate([w for _, w in chunks], axis=0)
    # first chunk is the small early-audio chunk, the rest fixed-size
    assert chunks[0][0].shape[1] == max(chunk_frames // 2, 1)
    for c, w in chunks[1:-1]:
        assert c.shape[1] == chunk_frames
        assert w.shape[0] == chunk_frames * CODEC.hop_length

    # offline: generate -> full causal decode -> crop at the prompt boundary
    codes, marks, out_iv, nm = decode.generate(
        lm, CFG, dec_cfg, x, y, [(T, T)], jax.random.PRNGKey(0),
        dtype_name="float32")
    # out_iv are the ORIGINAL (non-mask) segments in the output; the
    # generated TTS region runs from the end of the prompt segment to the
    # start of the (empty) tail segment
    s = out_iv[0][1]
    e = out_iv[1][0] if len(out_iv) > 1 else codes.shape[2]
    np.testing.assert_array_equal(got_codes, codes[0][:, s:e])
    full = np.asarray(seanet.decode(
        codec["decoder"],
        q.rvq_decode(codec["quantizer"], jnp.asarray(codes[:1])),
        CODEC.seanet))
    offline_crop = full[0, s * CODEC.hop_length:e * CODEC.hop_length]
    assert got_wav.shape == offline_crop.shape
    np.testing.assert_allclose(got_wav, offline_crop, atol=2e-5, rtol=1e-4)


def test_stream_tts_rejects_non_causal(models):
    lm, codec = models
    bad = CodecConfig(
        seanet=SEANetConfig(dimension=16, n_filters=2, n_residual_layers=1,
                            ratios=(4, 2), lstm=1, causal=False),
        rvq=RVQConfig(dimension=16, n_q=CFG.n_codebooks,
                      bins=CFG.tokens.audio_vocab_size))
    with pytest.raises(ValueError, match="causal"):
        stream.TTSStreamer(lm, CFG, DecodeConfig(), codec, bad)


def test_streaming_server_matches_offline(models):
    """3 concurrent clients through a 2-lane StreamingServer (the third
    refills a finished lane): each client's concatenated stream must equal
    its own offline generate -> causal decode -> crop, and chunks must be
    emitted incrementally (first-audio strictly before completion)."""
    lm, codec = models
    rng = np.random.default_rng(11)
    ts = CFG.tokens
    dec_cfg = DecodeConfig(top_k=1, top_p=1.0, stop_repetition=-1,
                           cfg_coef=1.5, cfg_stride=2, aug_text=True,
                           cfg_pretrained=True, max_gen_per_span=80,
                           length_cap_mult=10)
    reqs = []
    for T, sx in [(24, 40), (17, 28), (30, 36)]:
        y = rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, T))
        x = rng.integers(0, CFG.text_vocab_size - 1, size=(sx,))
        reqs.append((x, y))

    F = 10
    server = stream.StreamingServer(lm, CFG, dec_cfg, codec, CODEC, 2,
                                    chunk_frames=F, sx_pad=64, p_pad=64,
                                    dtype_name="float32", warm_chunk=8)
    emitted = []
    results, first_at, done_at = server.run_online(
        reqs, [0.0, 0.0, 0.0],
        on_chunk=lambda i, c, w, t: emitted.append((i, c, w)),
        rng=jax.random.PRNGKey(0))
    assert all(r is not None for r in results)
    for i, (x, y) in enumerate(reqs):
        T = y.shape[1]
        codes, marks, out_iv, nm = decode.generate(
            lm, CFG, dec_cfg, x, y, [(T, T)], jax.random.PRNGKey(0),
            dtype_name="float32")
        s = out_iv[0][1]
        e = out_iv[1][0] if len(out_iv) > 1 else codes.shape[2]
        got_codes, got_wav = results[i]
        np.testing.assert_array_equal(got_codes, codes[0][:, s:e])
        full = np.asarray(seanet.decode(
            codec["decoder"],
            q.rvq_decode(codec["quantizer"], jnp.asarray(codes[:1])),
            CODEC.seanet))
        offline_crop = full[0, s * CODEC.hop_length:e * CODEC.hop_length]
        assert got_wav.shape == offline_crop.shape
        np.testing.assert_allclose(got_wav, offline_crop, atol=2e-5,
                                   rtol=1e-4)
        # streaming actually streamed: first audio strictly earlier than done
        assert first_at[i] is not None and first_at[i] < done_at[i]
        # on_chunk granularity: f-sized batched codec steps; the first
        # emitted chunk may be shorter (it shares a step with the prompt
        # tail: emits f - T%f frames), the final flush may be shorter too
        f = F // 2
        mine = [c for j, c, _ in emitted if j == i]
        d = T - (T // 8) * 8  # prompt tail left after batch-1 warm (chunk=8)
        first_expect = f - (d % f) if d % f else f
        assert mine[0].shape[1] == min(first_expect, got_codes.shape[1])
        for c in mine[1:-1]:
            assert c.shape[1] == f
        total = sum(c.shape[1] for c in mine)
        assert total == got_codes.shape[1]


def test_streaming_server_rejects_tiny_chunk(models):
    lm, codec = models
    with pytest.raises(ValueError, match="chunk_frames"):
        stream.StreamingServer(lm, CFG, DecodeConfig(), codec, CODEC, 2,
                               chunk_frames=2 * CFG.n_codebooks)


def test_tp_streaming_server_matches_single(models):
    """StreamingServer with tensor-parallel-sharded LM params: the decode
    path is sharding-transparent (parallel/mesh.py::shard_params_for_serving),
    so the streamed multi-client output must be bit-exact vs the single-device
    server; the per-lane codec runs replicated."""
    from ssr_speech_tpu.parallel import mesh as meshlib

    lm, codec = models
    rng = np.random.default_rng(23)
    ts = CFG.tokens
    dec_cfg = DecodeConfig(top_k=1, top_p=1.0, stop_repetition=-1,
                           cfg_coef=1.5, cfg_stride=2, aug_text=True,
                           cfg_pretrained=True, max_gen_per_span=60,
                           length_cap_mult=10)
    reqs = []
    for T, sx in [(20, 32), (26, 36)]:
        y = rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, T))
        x = rng.integers(0, CFG.text_vocab_size - 1, size=(sx,))
        reqs.append((x, y))

    def run(params):
        server = stream.StreamingServer(params, CFG, dec_cfg, codec, CODEC,
                                        2, chunk_frames=10, sx_pad=64,
                                        p_pad=64, dtype_name="float32",
                                        warm_chunk=8)
        return server.run_online(reqs, [0.0, 0.0], rng=jax.random.PRNGKey(4))

    r0, _, _ = run(lm)
    mesh = meshlib.make_mesh(8, tp=2)
    lm_sh = meshlib.shard_params_for_serving(mesh, lm)
    r1, _, _ = run(lm_sh)
    for (c0, w0), (c1, w1) in zip(r0, r1):
        np.testing.assert_array_equal(c0, c1)
        np.testing.assert_allclose(w0, w1, atol=2e-5, rtol=1e-4)


def test_streaming_server_eager_prefill_parity(models):
    """Eager prefill staging (the next request prefilled behind the
    in-flight LM chunk) must not change any stream: identical codes, wavs,
    and fill order with eager_prefill=0 and =1."""
    lm, codec = models
    rng = np.random.default_rng(13)
    ts = CFG.tokens
    dec_cfg = DecodeConfig(top_k=1, top_p=1.0, stop_repetition=-1,
                           cfg_coef=1.0, cfg_stride=1, aug_text=False,
                           cfg_pretrained=True, max_gen_per_span=60,
                           length_cap_mult=10)
    reqs = []
    for T, sx in [(16, 24), (24, 30), (20, 26), (18, 22)]:
        y = rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, T))
        x = rng.integers(0, CFG.text_vocab_size - 1, size=(sx,))
        reqs.append((x, y))

    def run(eager):
        server = stream.StreamingServer(lm, CFG, dec_cfg, codec, CODEC, 2,
                                        chunk_frames=10, sx_pad=64, p_pad=64,
                                        dtype_name="float32", warm_chunk=8)
        return server.run_online(reqs, [0.0, 0.0, 0.01, 0.01],
                                 rng=jax.random.PRNGKey(0),
                                 eager_prefill=eager)

    res0, _, _ = run(0)
    res1, _, _ = run(1)
    for (c0, w0), (c1, w1) in zip(res0, res1):
        np.testing.assert_array_equal(c0, c1)
        np.testing.assert_allclose(w0, w1, atol=1e-6)


def test_streaming_server_empty_prompt(models):
    """A zero-frame prompt (TTS job whose mask starts at frame 0, i.e. the
    target replaces everything) streams fine and matches the offline
    generate exactly — serve_cli --stream relies on this instead of padding
    a fake 1-frame prompt from the source audio."""
    lm, codec = models
    rng = np.random.default_rng(21)
    sx = 40
    x = rng.integers(0, CFG.text_vocab_size - 1, size=(sx,))
    y0 = np.zeros((CFG.n_codebooks, 0), np.int32)
    dec_cfg = DecodeConfig(top_k=1, top_p=1.0, stop_repetition=-1,
                           cfg_coef=1.5, cfg_stride=2, aug_text=True,
                           cfg_pretrained=True, max_gen_per_span=60,
                           length_cap_mult=10)
    server = stream.StreamingServer(lm, CFG, dec_cfg, codec, CODEC, 2,
                                    chunk_frames=16, sx_pad=64, p_pad=64,
                                    dtype_name="float32")
    results, first_at, done_at = server.run_online(
        [(x, y0)], [0.0], rng=jax.random.PRNGKey(5))
    got_codes, got_wav = results[0]
    assert got_codes.shape[1] > 0 and first_at[0] is not None

    codes, marks, out_iv, nm = decode.generate(
        lm, CFG, dec_cfg, x, y0, [(0, 0)], jax.random.PRNGKey(5),
        tmax=256, dtype_name="float32")
    np.testing.assert_array_equal(got_codes, codes[0])
    full = np.asarray(seanet.decode(
        codec["decoder"],
        q.rvq_decode(codec["quantizer"], jnp.asarray(codes[:1])),
        CODEC.seanet))
    np.testing.assert_allclose(
        got_wav, full[0, : got_codes.shape[1] * CODEC.hop_length],
        atol=2e-5, rtol=1e-4)
