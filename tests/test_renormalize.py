"""EnCodec renormalize/scale plumbing (reference wmencodec.py:186-204,
324-375): per-utterance volume normalization before the encoder, scale
threaded through encode -> decode/wmdecode for denormalization."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssr_speech_tpu.config import CodecConfig, RVQConfig, SEANetConfig
from ssr_speech_tpu.data.tokenizer import AudioTokenizer
from ssr_speech_tpu.models.codec import wmencodec as wm

SEANET = SEANetConfig(dimension=16, n_filters=2, n_residual_layers=1,
                      ratios=(4, 2), lstm=1, norm="weight_norm")
CFG = CodecConfig(seanet=SEANET, rvq=RVQConfig(dimension=16, n_q=2, bins=17))
CFG_RN = dataclasses.replace(CFG, renormalize=True)


@pytest.fixture(scope="module")
def params():
    return wm.init_wmencodec(jax.random.PRNGKey(0), CFG)


def _wav(b=2, t=64, seed=0):
    rng = np.random.default_rng(seed)
    # distinct per-row volumes so per-utterance scales differ
    w = rng.normal(size=(b, t, 1)).astype(np.float32)
    return w * np.asarray([0.05, 1.7], np.float32)[:b, None, None]


def test_scale_is_mono_rms(params):
    wav = _wav()
    codes, scale, emb = wm.encode(params, wav, CFG_RN)
    assert scale.shape == (2, 1)
    mono = wav.mean(axis=2)
    want = 1e-8 + np.sqrt((mono ** 2).mean(axis=1, keepdims=True))
    np.testing.assert_allclose(np.asarray(scale), want, rtol=1e-6)
    # codes are computed on the NORMALIZED waveform (ref preprocess before
    # encoder): quiet and loud copies of the same signal code identically
    # up to the 1e-8 epsilon
    codes_quiet, _, _ = wm.encode(params, wav * 0.01, CFG_RN)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes_quiet))


def test_decode_applies_scale(params):
    wav = _wav()
    codes, scale, _ = wm.encode(params, wav, CFG_RN)
    plain = np.asarray(wm.decode(params, codes, CFG_RN))
    scaled = np.asarray(wm.decode(params, codes, CFG_RN, scale))
    np.testing.assert_allclose(scaled, plain * np.asarray(scale)[:, :, None],
                               rtol=1e-6)


def test_wmdecode_applies_scale(params):
    wav = _wav()
    codes, scale, _ = wm.encode(params, wav, CFG_RN)
    F = codes.shape[2]
    labels = jnp.zeros((2, F), jnp.int32)
    plain, mark_p = wm.wmdecode(params, codes, labels, jnp.asarray(wav),
                                CFG_RN)
    scaled, mark_s = wm.wmdecode(params, codes, labels, jnp.asarray(wav),
                                 CFG_RN, scale)
    np.testing.assert_allclose(np.asarray(scaled),
                               np.asarray(plain) * np.asarray(scale)[:, :, None],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(mark_p), np.asarray(mark_s))


def test_renormalize_off_yields_none(params):
    codes, scale, emb = wm.encode(params, _wav(), CFG)
    assert scale is None


def test_causal_rejects_renormalize(params):
    causal = dataclasses.replace(
        CFG_RN, seanet=dataclasses.replace(SEANET, causal=True,
                                           pad_mode="constant"))
    p = wm.init_wmencodec(jax.random.PRNGKey(0), causal)
    with pytest.raises(ValueError, match="renormalize"):
        wm.encode(p, jnp.asarray(_wav()), causal)


def test_tokenizer_threads_scale(params):
    tok = AudioTokenizer(params, CFG_RN)
    wav = _wav()
    codes, scale, emb = tok.encode(wav)
    assert scale is not None and scale.shape == (2, 1)
    out = tok.decode(codes, scale)
    np.testing.assert_allclose(
        out, tok.decode(codes) * scale[:, :, None], rtol=1e-6)
    # renormalize off: scale slot is None (the shipped-config behavior)
    tok_plain = AudioTokenizer(params, CFG)
    _, none_scale, _ = tok_plain.encode(wav)
    assert none_scale is None
