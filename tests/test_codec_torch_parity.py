"""Numerical parity of the JAX codec against the PyTorch reference modules.

Builds the reference SEANet/RVQ modules (random weights), converts their
state dict with ``models.convert``, and checks outputs agree to float32
tolerance. This is the mechanism that makes the "<1e-3 waveform MAE vs
reference codec round-trip" target testable without trained checkpoints
(BASELINE.md). Skipped when /root/reference is absent.
"""

import numpy as np
import pytest

from ssr_speech_tpu.config import CodecConfig, RVQConfig, SEANetConfig
from ssr_speech_tpu.models import convert
from ssr_speech_tpu.models.codec import conv as cv
from ssr_speech_tpu.models.codec import quantize as q
from ssr_speech_tpu.models.codec import seanet
from ssr_speech_tpu.models.codec import wmencodec as wm

from .reference_loader import load_reference_modules, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref():
    return load_reference_modules()


# small-but-structured config: 2 ratio stages, lstm, weight norm — exercises
# every code path of the conv stack quickly on CPU
SMALL = CodecConfig(
    seanet=SEANetConfig(dimension=32, n_filters=4, n_residual_layers=1,
                        ratios=(4, 2), lstm=1, kernel_size=7,
                        residual_kernel_size=3, last_kernel_size=7,
                        norm="weight_norm", pad_mode="constant"),
    rvq=RVQConfig(dimension=32, n_q=2, bins=19),
)
FULL = CodecConfig()  # the shipped encodec_large_nq4_s320 layout


def _sd(mod):
    import torch

    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _ref_encoder(ref, cfg: CodecConfig):
    sn = cfg.seanet
    return ref.seanet.SEANetEncoder(
        channels=sn.channels, dimension=sn.dimension, n_filters=sn.n_filters,
        n_residual_layers=sn.n_residual_layers, ratios=list(sn.ratios),
        kernel_size=sn.kernel_size, last_kernel_size=sn.last_kernel_size,
        residual_kernel_size=sn.residual_kernel_size,
        dilation_base=sn.dilation_base, norm=sn.norm, pad_mode=sn.pad_mode,
        lstm=sn.lstm, causal=sn.causal, compress=sn.compress,
    ).eval()


def _ref_decoder(ref, cfg: CodecConfig):
    sn = cfg.seanet
    return ref.seanet.SEANetDecoder(
        channels=sn.channels, dimension=sn.dimension, n_filters=sn.n_filters,
        n_residual_layers=sn.n_residual_layers, ratios=list(sn.ratios),
        kernel_size=sn.kernel_size, last_kernel_size=sn.last_kernel_size,
        residual_kernel_size=sn.residual_kernel_size,
        dilation_base=sn.dilation_base, norm=sn.norm, pad_mode=sn.pad_mode,
        lstm=sn.lstm, causal=sn.causal, compress=sn.compress,
        trim_right_ratio=sn.trim_right_ratio,
    ).eval()


FULL_P = pytest.param(FULL, id="full", marks=pytest.mark.slow)


@pytest.mark.parametrize("cfg", [pytest.param(SMALL, id="small"), FULL_P])
def test_encoder_parity(ref, cfg):
    import torch

    torch.manual_seed(0)
    enc = _ref_encoder(ref, cfg)
    params = convert.convert_seanet_encoder(_sd(enc), "", cfg)
    # strip the leading "." artifacts: prefix "" produces keys like ".model.0"
    T = (4 if cfg is SMALL else 2) * cfg.seanet.hop_length + 13
    x = np.random.default_rng(0).normal(size=(2, 1, T)).astype(np.float32)
    with torch.no_grad():
        want = enc(torch.from_numpy(x)).numpy()
    got = np.asarray(seanet.encode(params, x.transpose(0, 2, 1), cfg.seanet))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("cfg", [pytest.param(SMALL, id="small"), FULL_P])
def test_decoder_parity(ref, cfg):
    import torch

    torch.manual_seed(1)
    dec = _ref_decoder(ref, cfg)
    params = convert.convert_seanet_decoder(_sd(dec), "", cfg)
    F = 9
    z = np.random.default_rng(1).normal(size=(2, cfg.seanet.dimension, F)).astype(np.float32)
    with torch.no_grad():
        want = dec(torch.from_numpy(z)).numpy()
    got = np.asarray(seanet.decode(params, z.transpose(0, 2, 1), cfg.seanet))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=2e-5, rtol=1e-4)


def test_rvq_parity(ref):
    import torch

    torch.manual_seed(2)
    rvq = ref.vq.ResidualVectorQuantizer(
        dimension=32, n_q=2, bins=19, kmeans_init=False
    ).eval()
    sd = _sd(rvq)
    embed = np.stack([sd[f"vq.layers.{k}._codebook.embed"] for k in range(2)])
    params = dict(embed=embed)
    emb = np.random.default_rng(2).normal(size=(3, 32, 11)).astype(np.float32)
    with torch.no_grad():
        want_codes = rvq.encode(torch.from_numpy(emb)).numpy()
        want_latent = rvq.decode(torch.from_numpy(want_codes)).numpy()
    got_codes = np.asarray(q.rvq_encode(params, emb.transpose(0, 2, 1)))
    np.testing.assert_array_equal(got_codes, want_codes)
    got_latent = np.asarray(q.rvq_decode(params, got_codes))
    np.testing.assert_allclose(got_latent.transpose(0, 2, 1), want_latent,
                               atol=1e-5, rtol=1e-5)


def test_wm_decoder_parity_full_ratios(ref):
    """Full shipped geometry (ratios 8,5,4,2 -> 4 fusion stages) with reduced
    widths, to lock the stage/tap/repeat alignment (seanet.py:555-600)."""
    import torch

    torch.manual_seed(4)
    cfg = CodecConfig(
        seanet=SEANetConfig(dimension=16, n_filters=2, n_residual_layers=1,
                            ratios=(8, 5, 4, 2), lstm=2, norm="weight_norm",
                            pad_mode="constant"),
        rvq=RVQConfig(dimension=16, n_q=2, bins=7),
    )
    sn = cfg.seanet
    wmd = ref.seanet.WMSEANetDecoder(
        channels=1, dimension=sn.dimension, n_filters=sn.n_filters,
        n_residual_layers=1, ratios=list(sn.ratios), lstm=sn.lstm,
        norm=sn.norm, pad_mode=sn.pad_mode,
    ).eval()
    params = convert.convert_wm_decoder(_sd(wmd), "", cfg)
    hop = sn.hop_length
    F = 3
    rng = np.random.default_rng(4)
    latents = rng.normal(size=(1, sn.dimension, F)).astype(np.float32)
    labels = rng.integers(0, 2, size=(1, F))
    wav = rng.normal(size=(1, 1, F * hop)).astype(np.float32)
    with torch.no_grad():
        want_audio, want_logits = wmd(
            torch.from_numpy(latents), torch.from_numpy(labels),
            torch.from_numpy(wav),
        )
    got_audio, got_logits = seanet.wm_decode(
        params, latents.transpose(0, 2, 1), labels, wav.transpose(0, 2, 1), sn
    )
    np.testing.assert_allclose(
        np.asarray(got_audio).transpose(0, 2, 1), want_audio.numpy(),
        atol=3e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), want_logits.numpy(), atol=3e-5, rtol=1e-4
    )


def test_causal_codec_parity(ref):
    """Causal convolutions + trim_right_ratio (the streaming-oriented mode,
    reference conv.py:193-201,232-237) — untouched by the shipped config but
    part of the API surface."""
    import torch

    torch.manual_seed(5)
    cfg = CodecConfig(
        seanet=SEANetConfig(dimension=16, n_filters=2, n_residual_layers=1,
                            ratios=(4, 2), lstm=1, norm="weight_norm",
                            causal=True, pad_mode="constant",
                            trim_right_ratio=1.0),
        rvq=RVQConfig(dimension=16, n_q=2, bins=7),
    )
    sn = cfg.seanet
    enc = ref.seanet.SEANetEncoder(
        channels=1, dimension=sn.dimension, n_filters=sn.n_filters,
        n_residual_layers=1, ratios=list(sn.ratios), lstm=sn.lstm,
        norm=sn.norm, pad_mode=sn.pad_mode, causal=True,
    ).eval()
    dec = ref.seanet.SEANetDecoder(
        channels=1, dimension=sn.dimension, n_filters=sn.n_filters,
        n_residual_layers=1, ratios=list(sn.ratios), lstm=sn.lstm,
        norm=sn.norm, pad_mode=sn.pad_mode, causal=True,
        trim_right_ratio=1.0,
    ).eval()
    ep = convert.convert_seanet_encoder(_sd(enc), "", cfg)
    dp = convert.convert_seanet_decoder(_sd(dec), "", cfg)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 1, 5 * sn.hop_length + 3)).astype(np.float32)
    with torch.no_grad():
        want_lat = enc(torch.from_numpy(x)).numpy()
    got_lat = np.asarray(seanet.encode(ep, x.transpose(0, 2, 1), sn))
    np.testing.assert_allclose(got_lat.transpose(0, 2, 1), want_lat,
                               atol=2e-5, rtol=1e-4)
    z = rng.normal(size=(1, sn.dimension, 5)).astype(np.float32)
    with torch.no_grad():
        want_wav = dec(torch.from_numpy(z)).numpy()
    got_wav = np.asarray(seanet.decode(dp, z.transpose(0, 2, 1), sn))
    np.testing.assert_allclose(got_wav.transpose(0, 2, 1), want_wav,
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_roundtrip_mae_demo_wav_full_geometry(ref):
    """BASELINE.md protocol #1 at the SHIPPED geometry: encode->decode
    round-trip on demo/84_121550_000074_000000.wav, JAX vs torch with the
    same (converted) weights. Codes must agree and the waveform MAE must be
    far below the 1e-3 target."""
    import torch

    from ssr_speech_tpu.utils import audio as audio_io

    cfg = FULL
    torch.manual_seed(7)
    enc = _ref_encoder(ref, cfg)
    dec = _ref_decoder(ref, cfg)
    rvq = ref.vq.ResidualVectorQuantizer(
        dimension=cfg.rvq.dimension, n_q=cfg.rvq.n_q, bins=cfg.rvq.bins,
        kmeans_init=False,
    ).eval()
    ep = convert.convert_seanet_encoder(_sd(enc), "", cfg)
    dp = convert.convert_seanet_decoder(_sd(dec), "", cfg)
    embed = np.stack([_sd(rvq)[f"vq.layers.{k}._codebook.embed"]
                      for k in range(cfg.rvq.n_q)])
    qp = dict(embed=embed)

    wav = audio_io.load_for_codec("/root/reference/demo/84_121550_000074_000000.wav",
                                  cfg.sample_rate, cfg.hop_length)
    wav = wav[:, : 2 * cfg.sample_rate]  # 2 s keeps the torch CPU pass fast
    x_t = torch.from_numpy(wav.transpose(0, 2, 1))  # [1, 1, T]

    with torch.no_grad():
        lat = enc(x_t)
        want_codes = rvq.encode(lat).numpy()
        want_wav = dec(rvq.decode(torch.from_numpy(want_codes))).numpy()

    got_lat = np.asarray(seanet.encode(ep, wav, cfg.seanet))
    got_codes = np.asarray(q.rvq_encode(qp, got_lat))
    np.testing.assert_array_equal(got_codes, want_codes)
    got_wav = np.asarray(
        seanet.decode(dp, q.rvq_decode(qp, got_codes), cfg.seanet))

    mae = float(np.mean(np.abs(got_wav.transpose(0, 2, 1) - want_wav)))
    assert mae < 1e-3, f"round-trip MAE {mae} vs 1e-3 target"
    np.testing.assert_allclose(got_wav.transpose(0, 2, 1), want_wav,
                               atol=5e-4, rtol=1e-3)
