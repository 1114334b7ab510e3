"""Codec GAN training stack tests: STFT/mel ops, losses, discriminator,
balancer, and a full wmcompression train step on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssr_speech_tpu.config import CodecConfig, RVQConfig, SEANetConfig
from ssr_speech_tpu.models.codec import wmencodec as wm
from ssr_speech_tpu.ops import stft as stft_ops
from ssr_speech_tpu.training import codec_trainer, discriminators, losses as L

TINY = CodecConfig(
    sample_rate=16000,
    seanet=SEANetConfig(dimension=16, n_filters=2, n_residual_layers=1,
                        ratios=(8, 5, 4, 2), lstm=1, norm="weight_norm",
                        pad_mode="constant"),
    rvq=RVQConfig(dimension=16, n_q=2, bins=11),
)


def test_stft_matches_naive_dft():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 700)).astype(np.float32)
    n_fft, hop = 128, 32
    got = np.asarray(stft_ops.stft(jnp.asarray(x), n_fft, hop))
    win = stft_ops.hann_window(n_fft)
    n_frames = 1 + (700 - n_fft) // hop
    assert got.shape == (2, n_fft // 2 + 1, n_frames)
    for f in [0, 3, n_frames - 1]:
        seg = x[:, f * hop:f * hop + n_fft] * win
        want = np.fft.rfft(seg, axis=-1)
        np.testing.assert_allclose(got[:, :, f], want, atol=1e-3, rtol=1e-4)


def test_mel_filterbank_properties():
    fb = stft_ops.mel_filterbank(16000, 512, 64, 64.0, None)
    assert fb.shape == (257, 64)
    assert (fb >= 0).all()
    # every filter has some support
    assert (fb.sum(axis=0) > 0).all()


def test_mel_spectrogram_shapes_and_grad():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 2048, 1)).astype(np.float32))
    mel = stft_ops.mel_spectrogram(x, 16000, 512, 128, 512, n_mels=32, log=True)
    assert mel.shape[0] == 2 and mel.shape[1] == 32
    assert np.isfinite(np.asarray(mel)).all()

    def loss(x):
        return jnp.sum(stft_ops.mel_spectrogram(x, 16000, 512, 128, 512,
                                                n_mels=32, log=True) ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_multiscale_mel_zero_for_identical():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4096, 1)).astype(np.float32))
    v = float(L.multiscale_mel_loss(x, x, 16000, range_start=6, range_end=9))
    assert v == 0.0
    y = x + 0.1
    assert float(L.multiscale_mel_loss(x, y, 16000, range_start=6, range_end=9)) > 0


def test_discriminator_shapes():
    params = discriminators.init_msstftd(jax.random.PRNGKey(0), filters=4)
    wav = jnp.asarray(np.random.default_rng(3).normal(size=(2, 4096, 1)),
                      jnp.float32)
    logits, fmaps = discriminators.msstftd_forward(params, wav)
    assert len(logits) == len(discriminators.N_FFTS)
    assert all(lg.shape[0] == 2 and lg.shape[-1] == 1 for lg in logits)
    assert all(len(fm) == 5 for fm in fmaps)
    # reduced scale family (reference msstftd.n_ffts is a config list):
    # forward follows the init geometry
    p2 = discriminators.init_msstftd(jax.random.PRNGKey(0), filters=4,
                                     n_scales=2)
    logits2, _ = discriminators.msstftd_forward(p2, wav)
    assert len(logits2) == 2
    # bf16 activations: conv stack follows the input dtype
    lg_bf, fm_bf = discriminators.msstftd_forward(
        params, wav.astype(jnp.bfloat16))
    assert all(lg.dtype == jnp.bfloat16 for lg in lg_bf)
    assert all(t.dtype == jnp.bfloat16 for fm in fm_bf for t in fm)


def test_balancer_scales_to_unit_norm():
    state = L.init_balancer(["a", "b"])
    g_a = jnp.ones((2, 8)) * 3.0
    g_b = jnp.ones((2, 8)) * 0.5
    losses = dict(a=jnp.asarray(1.0), b=jnp.asarray(1.0))
    weights = dict(a=1.0, b=1.0)
    cot, state, eff = L.balancer_cotangent(
        state, dict(a=g_a, b=g_b), weights, losses, ema_decay=0.0
    )
    # each contribution rescaled to norm total_norm * ratio = 0.5
    na = 0.5 / float(jnp.mean(jnp.sqrt(jnp.sum(g_a**2, axis=1))))
    nb = 0.5 / float(jnp.mean(jnp.sqrt(jnp.sum(g_b**2, axis=1))))
    want = g_a * na + g_b * nb
    np.testing.assert_allclose(np.asarray(cot), np.asarray(want), rtol=1e-5)


@pytest.mark.slow
def test_codec_train_step_updates_only_wmdecoder():
    key = jax.random.PRNGKey(0)
    state, opts = codec_trainer.init_codec_train_state(key, TINY, lr=1e-3)
    step = codec_trainer.make_codec_train_step(TINY, opts)
    hop = TINY.hop_length
    F = 8
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(2, F * hop, 1)) * 0.1, jnp.float32)
    labels, keep = wm.sample_watermark_mask(rng, 2, F, hop, min_regions=1)
    frozen_before = jax.tree.map(np.asarray, state.frozen)
    wm_before = np.asarray(jax.tree.leaves(state.wm_params)[0])
    new_state, metrics = step(state, wav, jnp.asarray(labels), jnp.asarray(keep))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # wm decoder changed
    wm_after = np.asarray(jax.tree.leaves(new_state.wm_params)[0])
    assert not np.allclose(wm_before, wm_after)
    # frozen stack untouched
    for a, b in zip(jax.tree.leaves(frozen_before),
                    jax.tree.leaves(jax.tree.map(np.asarray, new_state.frozen))):
        np.testing.assert_array_equal(a, b)
    # second step runs (balancer EMA state advances)
    assert float(new_state.balancer.count) == 1.0
    new_state2, m2 = step(new_state, wav, jnp.asarray(labels), jnp.asarray(keep))
    assert float(new_state2.step) == 2


@pytest.mark.slow
def test_codec_train_step_bf16_matches_f32():
    """The bf16 compute path (train_codec's TPU default; activations bf16,
    params/losses/optimizer f32) stays within bf16 rounding of the full-f32
    step: losses agree to <2% and the Adam update moves every trained leaf by
    at most the lr (the bandwidth-bound roofline motivation is
    tools/codec_trace_probe.py; docstring at make_codec_train_step)."""
    hop = TINY.hop_length
    F = 8
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.normal(size=(2, F * hop, 1)) * 0.1, jnp.float32)
    labels, keep = wm.sample_watermark_mask(rng, 2, F, hop, min_regions=1)
    labels, keep = jnp.asarray(labels), jnp.asarray(keep)

    s32_state, opts = codec_trainer.init_codec_train_state(
        jax.random.PRNGKey(0), TINY, lr=1e-3)
    sbf_state, _ = codec_trainer.init_codec_train_state(
        jax.random.PRNGKey(0), TINY, lr=1e-3)
    step32 = codec_trainer.make_codec_train_step(TINY, opts)
    stepbf = codec_trainer.make_codec_train_step(
        TINY, opts, compute_dtype="bfloat16")
    n32, m32 = step32(s32_state, wav, labels, keep)
    nbf, mbf = stepbf(sbf_state, wav, labels, keep)
    for k in m32:
        a, b = float(m32[k]), float(mbf[k])
        assert np.isfinite(b), (k, b)
        assert abs(a - b) <= 0.02 * abs(a) + 1e-4, (k, a, b)
    # every trained tensor stays f32 and moves by <= ~2*lr (Adam's bound)
    for p, q in zip(jax.tree.leaves(n32.wm_params),
                    jax.tree.leaves(nbf.wm_params)):
        assert q.dtype == jnp.float32
        assert float(jnp.max(jnp.abs(p - q))) <= 2.1e-3


def test_watermark_mask_sampler():
    rng = np.random.default_rng(5)
    labels, keep = wm.sample_watermark_mask(rng, 4, 20, 320, min_regions=1,
                                            max_regions=2)
    assert labels.shape == (4, 20) and keep.shape == (4, 20 * 320)
    for b in range(4):
        # keep is 0 exactly where labels upsampled are 1
        up = np.repeat(labels[b], 320)
        np.testing.assert_array_equal(keep[b] == 0.0, up == 1)
        frac = labels[b].mean()
        assert frac <= 0.81


@pytest.mark.slow
def test_msd_mpd_discriminators():
    from ssr_speech_tpu.training.discriminators import (
        get_adversary, init_mpd, init_msd, mpd_forward, msd_forward,
    )

    rng = np.random.default_rng(7)
    wav = jnp.asarray(rng.normal(size=(2, 6400, 1)) * 0.1, jnp.float32)
    msd = init_msd(jax.random.PRNGKey(0))
    logits, fmaps = msd_forward(msd, wav)
    assert len(logits) == 3 and len(fmaps[0]) == 7
    assert all(np.isfinite(np.asarray(l)).all() for l in logits)

    mpd = init_mpd(jax.random.PRNGKey(1))
    logits, fmaps = mpd_forward(mpd, wav)
    assert len(logits) == 5 and len(fmaps[0]) == 6
    assert all(np.isfinite(np.asarray(l)).all() for l in logits)

    params, fwd = get_adversary("msstftd", jax.random.PRNGKey(2), filters=4)
    lg, _ = fwd(params, wav)
    assert len(lg) == 5


@pytest.mark.slow
def test_compression_train_step_trains_autoencoder():
    key = jax.random.PRNGKey(2)
    state, opts = codec_trainer.init_compression_train_state(key, TINY, lr=1e-3)
    step = codec_trainer.make_compression_train_step(TINY, opts)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(2, 8 * TINY.hop_length, 1)) * 0.1,
                      jnp.float32)
    enc_before = np.asarray(jax.tree.leaves(state.frozen["encoder"])[0])
    dec_before = np.asarray(jax.tree.leaves(state.frozen["decoder"])[0])
    quant_before = np.asarray(state.frozen["quantizer"]["embed"])
    new_state, metrics = step(state, wav)  # donates state
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert not np.allclose(enc_before,
                           np.asarray(jax.tree.leaves(new_state.frozen["encoder"])[0]))
    assert not np.allclose(dec_before,
                           np.asarray(jax.tree.leaves(new_state.frozen["decoder"])[0]))
    # quantizer codebooks stay frozen (reference core_vq.py:205-217)
    np.testing.assert_array_equal(
        quant_before, np.asarray(new_state.frozen["quantizer"]["embed"]))


def test_kmeans_init_codebooks():
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.normal(size=(300, TINY.rvq.dimension)), jnp.float32)
    books = codec_trainer.kmeans_init_codebooks(jax.random.PRNGKey(0), TINY,
                                                emb, iters=5)
    assert books.shape == (TINY.rvq.n_q, TINY.rvq.bins, TINY.rvq.dimension)
    assert np.isfinite(np.asarray(books)).all()


def test_rvq_quantize_dropout():
    from ssr_speech_tpu.models.codec import quantize as q

    rng = np.random.default_rng(3)
    params = q.init_rvq(jax.random.PRNGKey(0), TINY.rvq)
    emb = jnp.asarray(rng.normal(size=(2, 6, TINY.rvq.dimension)), jnp.float32)
    # full-depth dropout draw must equal the deterministic quantizer
    for seed in range(6):
        out, codes = q.rvq_quantize_dropout(params, emb, jax.random.PRNGKey(seed))
        full, full_codes = q.rvq_quantize(params, emb)
        np.testing.assert_array_equal(np.asarray(codes)[:, :1],
                                      np.asarray(full_codes)[:, :1])
        err_drop = float(jnp.mean((out - emb) ** 2))
        assert np.isfinite(err_drop)


def test_sharded_checkpoint_roundtrip(tmp_path):
    from ssr_speech_tpu.utils import checkpoint as ckpt

    tree = {"a": jnp.arange(12.0).reshape(3, 4), "b": {"c": jnp.ones((5,))}}
    path = str(tmp_path / "orbax_ckpt")
    ckpt.save_sharded(path, tree)
    back = ckpt.load_sharded(path)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(back["b"]["c"]),
                                  np.asarray(tree["b"]["c"]))


@pytest.mark.slow
def test_configurable_losses_and_mse_adversary():
    """The full reference loss space is selectable: extra mel/mstft/l2
    reconstruction terms in the balancer and the mse adversarial family
    (reference solver `losses:` weights + adversarial.loss=mse)."""
    key = jax.random.PRNGKey(1)
    bw = {"adv": 4.0, "feat": 4.0, "l1": 0.1, "msspec": 2.0,
          "mel": 1.0, "mstft": 1.0, "l2": 0.5}
    state, opts = codec_trainer.init_codec_train_state(
        key, TINY, lr=1e-3, balance_weights=bw)
    step = codec_trainer.make_codec_train_step(
        TINY, opts, balance_weights=bw, adv_loss_mode="mse")
    hop = TINY.hop_length
    F = 8
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.normal(size=(2, F * hop, 1)) * 0.1, jnp.float32)
    labels, keep = wm.sample_watermark_mask(rng, 2, F, hop, min_regions=1)
    wm_before = np.asarray(jax.tree.leaves(state.wm_params)[0])
    new_state, metrics = step(state, wav, jnp.asarray(labels),
                              jnp.asarray(keep))
    for k in ("mel", "mstft", "l2", "adv", "feat", "l1", "msspec"):
        assert np.isfinite(float(metrics[k])), (k, metrics[k])
    assert not np.allclose(wm_before,
                           np.asarray(jax.tree.leaves(new_state.wm_params)[0]))

    # unknown loss key fails loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown loss"):
        codec_trainer.make_codec_train_step(
            TINY, opts, balance_weights={"adv": 1, "feat": 1, "nope": 1})


def test_mse_adversarial_losses_numerics():
    """mse family (reference adversarial/losses.py:241-247): generator
    pulls fake logits to 1, discriminator pushes real->1 / fake->0."""
    ones = jnp.ones((2, 5))
    zeros = jnp.zeros((2, 5))
    assert float(L.mse_gen_loss(ones)) == 0.0
    assert float(L.mse_gen_loss(zeros)) == 1.0
    assert float(L.mse_real_loss(ones)) == 0.0
    assert float(L.mse_fake_loss(zeros)) == 0.0
    assert float(L.mse_fake_loss(ones)) == 1.0
