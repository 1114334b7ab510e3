"""Watermarked EnCodec facade: encode / decode / wmdecode / detect_watermark.

Capability parity with reference ``audiocraft/audiocraft/models/wmencodec.py``:
  - encode: SEANet encoder + RVQ -> codes [B, K, F] (+ scale, + latents)
    (wmencodec.py:324-339),
  - decode: RVQ dequant + SEANet decoder (wmencodec.py:341-356),
  - wmdecode: RVQ dequant + watermark decoder fusing the original waveform
    and per-frame 0/1 labels (wmencodec.py:358-375),
  - detect_watermark: detector head argmax (wmencodec.py:377-382),
  - training forward with random span masking producing watermark labels
    (wmencodec.py:206-263) — see ``training.codec_trainer``.

All functions operate on [B, T, C] waveforms (feature-last) and are jittable.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import CodecConfig
from . import quantize as q
from . import seanet

Params = Dict[str, Any]


@functools.partial(jax.jit, static_argnames=("cfg",))
def init_wmencodec(key, cfg: CodecConfig) -> Params:
    # jitted: one program instead of thousands of small dispatched ops
    # (full geometry on a warm chip: 58 -> 48 s incl compile; cached reuse
    # is sub-second)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return dict(
        encoder=seanet.init_encoder(k1, cfg.seanet),
        decoder=seanet.init_decoder(k2, cfg.seanet),
        wmdecoder=seanet.init_wm_decoder(k3, cfg.seanet),
        quantizer=q.init_rvq(k4, cfg.rvq),
    )


def preprocess(wav: jnp.ndarray, cfg: CodecConfig
               ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Optional per-utterance volume renormalization before the encoder
    (reference wmencodec.py:186-196): scale = 1e-8 + rms of the mono mix
    over the whole segment. Returns (wav, scale [B, 1] or None); the shipped
    config has renormalize=false, matching the reference
    (config/encodec/default.yaml)."""
    if not cfg.renormalize:
        return wav, None
    if cfg.seanet.causal:
        # mirrors the reference constructor assert (wmencodec.py:162-164):
        # a causal stream has no whole-segment volume to normalize by
        raise ValueError("Causal model does not support renormalize")
    mono = wav.mean(axis=2, keepdims=True)  # [B, T, 1]
    volume = jnp.sqrt(jnp.mean(mono ** 2, axis=1, keepdims=True))
    scale = 1e-8 + volume  # [B, 1, 1]
    return wav / scale, scale[:, 0]  # scale as [B, 1] (ref .view(-1, 1))


def postprocess(wav: jnp.ndarray, scale: Optional[jnp.ndarray] = None
                ) -> jnp.ndarray:
    """Undo :func:`preprocess` on a decoded waveform [B, T, C]
    (reference wmencodec.py:198-204)."""
    if scale is not None:
        wav = wav * scale[:, :, None]
    return wav


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode(params: Params, wav: jnp.ndarray, cfg: CodecConfig
           ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """wav [B, T, C] -> (codes [B, K, F], scale [B, 1] or None,
    latents [B, F, D]) — the reference encode contract (wmencodec.py:324-339);
    scale is None unless ``cfg.renormalize``."""
    wav, scale = preprocess(wav, cfg)
    emb = seanet.encode(params["encoder"], wav, cfg.seanet)
    codes = q.rvq_encode(params["quantizer"], emb, cfg.rvq.n_q)
    return codes, scale, emb


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode(params: Params, codes: jnp.ndarray, cfg: CodecConfig,
           scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """codes [B, K, F] -> wav [B, F*hop, C]; ``scale`` (from :func:`encode`)
    denormalizes the output (reference wmencodec.py:341-356)."""
    emb = q.rvq_decode(params["quantizer"], codes)
    return postprocess(seanet.decode(params["decoder"], emb, cfg.seanet),
                       scale)


@functools.partial(jax.jit, static_argnames=("cfg",))
def wmdecode(
    params: Params,
    codes: jnp.ndarray,  # [B, K, F]
    labels: jnp.ndarray,  # [B, F] int 0/1 (1 = generated/watermark region)
    waveform: jnp.ndarray,  # [B, F*hop, C] original audio, masked regions zeroed
    cfg: CodecConfig,
    scale: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Watermark decode (reference wmencodec.py:358-375): returns
    (wav [B, F*hop, C], detector logits [B, F, 2]); ``scale`` denormalizes
    the fused output like :func:`decode`."""
    emb = q.rvq_decode(params["quantizer"], codes)
    out, mark = seanet.wm_decode(params["wmdecoder"], emb, labels, waveform,
                                 cfg.seanet)
    return postprocess(out, scale), mark


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_watermark(params: Params, wav: jnp.ndarray, cfg: CodecConfig) -> jnp.ndarray:
    """wav [B, T, C] -> per-frame watermark decision [B, F]
    (reference wmencodec.py:377-382)."""
    logits = seanet.detect_watermark_logits(params["wmdecoder"], wav, cfg.seanet)
    return jnp.argmax(logits, axis=-1)


def sample_watermark_mask(
    rng: np.random.Generator,
    batch: int,
    n_frames: int,
    hop: int,
    min_regions: int = 0,
    max_regions: int = 2,
    max_fraction: float = 0.8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side random watermark-span sampling for codec training
    (reference wmencodec.py:206-235): returns (labels [B, F] 0/1,
    audio_keep [B, F*hop] 1 outside masked regions, 0 inside)."""
    labels = np.zeros((batch, n_frames), np.int32)
    keep = np.ones((batch, n_frames * hop), np.float32)
    for b in range(batch):
        n_regions = int(rng.integers(min_regions, max_regions + 1))
        total = 0
        for _ in range(n_regions):
            if total >= int(max_fraction * n_frames):
                break
            mask_len = int(rng.integers(1, int(n_frames * max_fraction) + 1))
            if total + mask_len > max_fraction * n_frames:
                mask_len = int(max_fraction * n_frames) - total
            if mask_len <= 0:
                break
            start = int(rng.integers(0, n_frames - mask_len + 1))
            labels[b, start:start + mask_len] = 1
            keep[b, start * hop:(start + mask_len) * hop] = 0.0
            total += mask_len
    return labels, keep
