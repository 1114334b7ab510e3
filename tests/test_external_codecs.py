"""External codec adapters (HF EnCodec / DAC) behind the tokenizer contract."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_hf_encodec():
    transformers = pytest.importorskip("transformers")
    cfg = transformers.EncodecConfig(
        # nc = bw*1000 / (frame_rate * log2(card)) = bw*1000/200 must be int
        target_bandwidths=[0.2, 0.4],
        sampling_rate=16000,
        audio_channels=1,
        num_filters=4,
        num_residual_layers=1,
        upsampling_ratios=[8, 5, 4, 2],
        codebook_size=16,  # 4 bits -> 0.25 kbps/codebook at 50 Hz... tiny
        codebook_dim=8,
        hidden_size=8,
        num_lstm_layers=1,
    )
    import torch

    torch.manual_seed(0)
    return transformers.EncodecModel(cfg).eval()


def test_hf_encodec_wrapper_roundtrip(tiny_hf_encodec):
    from ssr_speech_tpu.models.codec.external import HFEncodecCodec

    codec = HFEncodecCodec(tiny_hf_encodec)
    assert codec.sample_rate == 16000
    assert codec.cardinality == 16
    hop = 8 * 5 * 4 * 2
    assert codec.frame_rate == pytest.approx(16000 / hop)
    # bandwidth -> codebook count math (reference encodec.py:328-334)
    assert codec.possible_num_codebooks == sorted(codec.possible_num_codebooks)

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(1, hop * 10, 1)) * 0.1).astype(np.float32)
    codes, scales = codec.encode(wav)
    assert codes.shape[0] == 1 and codes.shape[1] == codec.num_codebooks
    assert codes.shape[2] == 10
    assert codes.min() >= 0 and codes.max() < codec.cardinality
    out = codec.decode(codes, scales)
    assert out.shape[0] == 1 and out.shape[2] == 1
    assert np.isfinite(out).all()


def test_hf_encodec_num_codebooks_switch(tiny_hf_encodec):
    from ssr_speech_tpu.models.codec.external import HFEncodecCodec

    codec = HFEncodecCodec(tiny_hf_encodec)
    low = min(codec.possible_num_codebooks)
    codec.set_num_codebooks(low)
    rng = np.random.default_rng(1)
    wav = (rng.normal(size=(1, 320 * 5, 1)) * 0.1).astype(np.float32)
    codes, _ = codec.encode(wav)
    assert codes.shape[1] == low
    with pytest.raises(ValueError):
        codec.set_num_codebooks(9999)


def test_dac_gated_like_reference():
    from ssr_speech_tpu.models.codec.external import DACCodec

    try:
        import dac  # noqa: F401
        pytest.skip("dac installed; gating not exercisable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="descript-audio-codec"):
        DACCodec()
