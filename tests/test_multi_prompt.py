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


@pytest.mark.slow
def test_inference_multi_pipeline(params, tmp_path):
    """inference_multi: several jobs through encode -> multi-decode ->
    watermark decode in one pass."""
    from ssr_speech_tpu.config import CodecConfig, RVQConfig, SEANetConfig
    from ssr_speech_tpu.data.tokenizer import AudioTokenizer, TextTokenizer
    from ssr_speech_tpu.inference.pipeline import inference_multi
    from ssr_speech_tpu.models.codec import wmencodec as wm
    from ssr_speech_tpu.utils import audio as audio_io

    codec_cfg = CodecConfig(
        seanet=SEANetConfig(dimension=16, n_filters=2, n_residual_layers=1,
                            ratios=(8, 5, 4, 2), lstm=1, norm="weight_norm",
                            pad_mode="constant"),
        rvq=RVQConfig(dimension=16, n_q=CFG.n_codebooks,
                      bins=CFG.tokens.audio_vocab_size),
    )
    codec_params = wm.init_wmencodec(jax.random.PRNGKey(1), codec_cfg)
    atok = AudioTokenizer(codec_params, codec_cfg)
    ttok = TextTokenizer()
    phn2num = {c: i for i, c in enumerate("abcdefghijklmnopqrstuvwxyz_ ")}
    rng = np.random.default_rng(0)
    hop = codec_cfg.hop_length
    jobs = []
    for i, frames in enumerate([20, 28]):
        path = str(tmp_path / f"in{i}.wav")
        audio_io.write_wav(path, (rng.normal(size=(1, frames * hop)) * 0.1
                                  ).astype(np.float32), codec_cfg.sample_rate)
        jobs.append(dict(audio_path=path, target_text="hello world",
                         mask_interval=[(5, 12)]))
    dec = DecodeConfig(aug_text=False, top_k=5, stop_repetition=-1,
                       max_gen_per_span=40, length_cap_mult=10)
    outs = inference_multi(params, CFG, dec, phn2num, ttok, atok, jobs,
                           use_watermark=True, seed=2)
    assert len(outs) == 2
    for out in outs:
        assert out.ndim == 3 and np.isfinite(out).all()


@pytest.mark.parametrize("aug_text", [False, True])
def test_multi_prompt_mixed_span_counts(params, aug_text):
    """Prompts with DIFFERENT span counts in one batch (TTS 1-span job
    alongside 2-span edits): each output equals its single-prompt greedy
    decode; early-finishing chains freeze while others continue."""
    rng = np.random.default_rng(33)
    ts = CFG.tokens
    prompts = [
        # 1 span (TTS-style: mask to the end)
        (rng.integers(0, CFG.text_vocab_size - 1, size=(18,)),
         rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, 22)),
         [(22, 22)]),
        # 2 spans
        (rng.integers(0, CFG.text_vocab_size - 1, size=(24,)),
         rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, 34)),
         [(5, 10), (18, 25)]),
        # 1 span mid-utterance
        (rng.integers(0, CFG.text_vocab_size - 1, size=(15,)),
         rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, 28)),
         [(10, 16)]),
    ]
    dec = DecodeConfig(top_k=1, top_p=1.0, stop_repetition=-1,
                       cfg_coef=1.5, cfg_stride=2, aug_text=aug_text,
                       cfg_pretrained=True, max_gen_per_span=120,
                       length_cap_mult=10)
    multi = decode.generate_multi(params, CFG, dec, prompts,
                                  jax.random.PRNGKey(0), dtype_name="float32")
    for (x, y, mask), (codes_m, marks_m, oi_m, nm_m) in zip(prompts, multi):
        codes_1, marks_1, oi_1, nm_1 = decode.generate(
            params, CFG, dec, x, y, mask, jax.random.PRNGKey(0),
            dtype_name="float32",
        )
        np.testing.assert_array_equal(codes_m, codes_1)
        np.testing.assert_array_equal(marks_m, marks_1)
        assert oi_m == oi_1 and nm_m == nm_1
