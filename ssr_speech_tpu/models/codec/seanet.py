"""SEANet conv encoder/decoder and the watermark decoder, TPU-native.

Capability parity with the reference (``audiocraft/audiocraft/modules/seanet.py``):
  - SEANetEncoder (seanet.py:63-153): conv-in, per-ratio [res-blocks, ELU,
    strided down-conv], LSTM bottleneck, ELU + conv-out. Encoder uses the
    ratios reversed (seanet.py:101).
  - SEANetDecoder (seanet.py:156-258): conv-in, LSTM, per-ratio [ELU,
    transposed up-conv, res-blocks], ELU + conv-out.
  - WMSEANetDecoder (seanet.py:395-600): the decoder plus a ``skip_encoder``
    tapping 4 intermediate resolutions of the masked original waveform, a
    2-entry watermark-label embedding (max-norm) repeat-interleaved to each
    resolution, fused by 1x1 projections + residual into the decode stages,
    and a ``wm_encoder``+``wm_predictor`` detector head on the output.

Instead of slicing a flat nn.Sequential by magic indices (seanet.py:560-591),
stages here are explicit: the encoder can return taps at the boundaries the
watermark decoder consumes, and the decoder exposes per-stage application.

Layout: [B, T, C]; weights per ``codec.conv``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ...config import SEANetConfig
from . import conv as cv

Params = Dict[str, Any]

act = jax.nn.elu  # ELU alpha=1.0 (config activation_params)


# ----------------------------------------------------------------- res block

def init_resblock(key, dim: int, cfg: SEANetConfig, norm: bool) -> Params:
    hidden = dim // cfg.compress
    k1, k2 = jax.random.split(key)
    return dict(
        conv1=cv.init_conv(k1, cfg.residual_kernel_size, dim, hidden, weight_norm=norm),
        conv2=cv.init_conv(k2, 1, hidden, dim, weight_norm=norm),
    )


def resblock(p: Params, x: jnp.ndarray, cfg: SEANetConfig, dilation: int) -> jnp.ndarray:
    """[ELU, conv k3 dilated, ELU, conv k1] + identity skip (reference
    seanet.py:16-60, true_skip). Dilation = dilation_base**j for the j-th
    residual layer in a group (derived from position, not stored)."""
    h = act(x)
    h = cv.conv1d(p["conv1"], h, dilation=dilation, causal=cfg.causal,
                  pad_mode=cfg.pad_mode)
    h = act(h)
    h = cv.conv1d(p["conv2"], h, causal=cfg.causal, pad_mode=cfg.pad_mode)
    return x + h


# ------------------------------------------------------------------- encoder

def init_encoder(key, cfg: SEANetConfig) -> Params:
    ratios = list(reversed(cfg.ratios))
    n_blocks = len(ratios) + 2
    wn = cfg.norm == "weight_norm"

    def blk_norm(i):  # i = block index starting at 1 for conv-in
        return wn and not (cfg.disable_norm_outer_blocks >= i)

    keys = jax.random.split(key, 3 + len(ratios) * (cfg.n_residual_layers + 1))
    ki = iter(keys)
    mult = 1
    params: Params = dict(
        conv_in=cv.init_conv(next(ki), cfg.kernel_size, cfg.channels,
                             mult * cfg.n_filters, weight_norm=blk_norm(1)),
        groups=[],
    )
    for i, ratio in enumerate(ratios):
        norm = blk_norm(i + 2)
        res = [
            init_resblock(next(ki), mult * cfg.n_filters, cfg, norm)
            for j in range(cfg.n_residual_layers)
        ]
        down = cv.init_conv(next(ki), ratio * 2, mult * cfg.n_filters,
                            mult * cfg.n_filters * 2, weight_norm=norm)
        params["groups"].append(dict(res=res, down=down))
        mult *= 2
    if cfg.lstm:
        params["lstm"] = cv.init_lstm(next(ki), mult * cfg.n_filters, cfg.lstm)
    params["conv_out"] = cv.init_conv(
        next(ki), cfg.last_kernel_size, mult * cfg.n_filters, cfg.dimension,
        weight_norm=wn and cfg.disable_norm_outer_blocks != n_blocks,
    )
    return params


def encode(
    p: Params, x: jnp.ndarray, cfg: SEANetConfig, return_taps: bool = False
):
    """x [B, T, 1] -> latents [B, T/hop, dimension].

    With ``return_taps``, also returns the intermediate activations at the
    boundaries the watermark decoder consumes (reference seanet.py:560-574):
    tap[i] = after down-conv i's following res-blocks; the deepest tap is the
    final latent.
    """
    h = cv.conv1d(p["conv_in"], x, causal=cfg.causal, pad_mode=cfg.pad_mode)
    taps: List[jnp.ndarray] = []
    enc_ratios = list(reversed(cfg.ratios))
    for i, g in enumerate(p["groups"]):
        for j, rp in enumerate(g["res"]):
            h = resblock(rp, h, cfg, cfg.dilation_base ** j)
        if return_taps:
            taps.append(h)  # after res-blocks, before the down-conv act
        h = act(h)
        h = cv.conv1d(g["down"], h, stride=enc_ratios[i], causal=cfg.causal,
                      pad_mode=cfg.pad_mode)
    if "lstm" in p:
        h = cv.lstm_skip(p["lstm"], h)
    h = act(h)
    h = cv.conv1d(p["conv_out"], h, causal=cfg.causal, pad_mode=cfg.pad_mode)
    if return_taps:
        taps.append(h)
        return h, taps
    return h


# ------------------------------------------------------------------- decoder

def init_decoder(key, cfg: SEANetConfig) -> Params:
    n_blocks = len(cfg.ratios) + 2
    wn = cfg.norm == "weight_norm"

    def blk_norm_up(i):  # i-th up-stage (0-based); norm disabled for last N blocks
        return wn and not (cfg.disable_norm_outer_blocks >= n_blocks - (i + 1))

    keys = jax.random.split(key, 3 + len(cfg.ratios) * (cfg.n_residual_layers + 1))
    ki = iter(keys)
    mult = int(2 ** len(cfg.ratios))
    params: Params = dict(
        conv_in=cv.init_conv(next(ki), cfg.kernel_size, cfg.dimension,
                             mult * cfg.n_filters,
                             weight_norm=wn and cfg.disable_norm_outer_blocks != n_blocks),
        groups=[],
    )
    if cfg.lstm:
        params["lstm"] = cv.init_lstm(next(ki), mult * cfg.n_filters, cfg.lstm)
    for i, ratio in enumerate(cfg.ratios):
        norm = blk_norm_up(i)
        up = cv.init_conv_transpose(next(ki), ratio * 2, mult * cfg.n_filters,
                                    mult * cfg.n_filters // 2, weight_norm=norm)
        res = [
            init_resblock(next(ki), mult * cfg.n_filters // 2, cfg, norm)
            for j in range(cfg.n_residual_layers)
        ]
        params["groups"].append(dict(up=up, res=res))
        mult //= 2
    params["conv_out"] = cv.init_conv(
        next(ki), cfg.last_kernel_size, cfg.n_filters, cfg.channels,
        weight_norm=wn and cfg.disable_norm_outer_blocks < 1,
    )
    return params


def _decoder_stage0(p: Params, z: jnp.ndarray, cfg: SEANetConfig) -> jnp.ndarray:
    """conv-in [+ LSTM] + first up-conv (reference decoder model[:4])."""
    h = cv.conv1d(p["conv_in"], z, causal=cfg.causal, pad_mode=cfg.pad_mode)
    if "lstm" in p:
        h = cv.lstm_skip(p["lstm"], h)
    g = p["groups"][0]
    h = act(h)
    return cv.conv_transpose1d(g["up"], h, stride=cfg.ratios[0], causal=cfg.causal,
                               trim_right_ratio=cfg.trim_right_ratio)


def _decoder_stage(p: Params, h: jnp.ndarray, i: int, cfg: SEANetConfig) -> jnp.ndarray:
    """res-blocks of group i-1 then up-conv of group i (reference model[4:7] etc.)."""
    prev = p["groups"][i - 1]
    for j, rp in enumerate(prev["res"]):
        h = resblock(rp, h, cfg, cfg.dilation_base ** j)
    g = p["groups"][i]
    h = act(h)
    return cv.conv_transpose1d(g["up"], h, stride=cfg.ratios[i], causal=cfg.causal,
                               trim_right_ratio=cfg.trim_right_ratio)


def _decoder_tail(p: Params, h: jnp.ndarray, cfg: SEANetConfig) -> jnp.ndarray:
    """last group's res-blocks + ELU + conv-out (reference model[10:])."""
    for j, rp in enumerate(p["groups"][-1]["res"]):
        h = resblock(rp, h, cfg, cfg.dilation_base ** j)
    h = act(h)
    h = cv.conv1d(p["conv_out"], h, causal=cfg.causal, pad_mode=cfg.pad_mode)
    if cfg.final_activation == "Tanh":
        h = jnp.tanh(h)
    return h


def decode(p: Params, z: jnp.ndarray, cfg: SEANetConfig) -> jnp.ndarray:
    """z [B, T/hop, dimension] -> waveform [B, T, channels]."""
    h = _decoder_stage0(p, z, cfg)
    for i in range(1, len(cfg.ratios)):
        h = _decoder_stage(p, h, i, cfg)
    return _decoder_tail(p, h, cfg)


# ---------------------------------------------------------- watermark decoder

def init_wm_decoder(key, cfg: SEANetConfig) -> Params:
    """Decoder + skip/wm encoders + label embedding + fusion projections
    (reference seanet.py:425-553)."""
    ks = jax.random.split(key, 10)
    dim, nf = cfg.dimension, cfg.n_filters
    emb_dim = dim // 16
    n_up = len(cfg.ratios)
    params: Params = dict(
        decoder=init_decoder(ks[0], cfg),
        skip_encoder=init_encoder(ks[1], cfg),
        wm_encoder=init_encoder(ks[2], cfg),
        wm_embed=jax.random.normal(ks[3], (2, emb_dim), jnp.float32),
    )
    mult = int(2 ** n_up)
    # proj0 fuses at latent rate: dimension + emb -> dimension
    params["projs"] = [
        dict(conv=cv.init_conv(ks[4], 1, dim + emb_dim, dim, weight_norm=False))
    ]
    for i in range(1, n_up):
        mult //= 2
        params["projs"].append(
            dict(conv=cv.init_conv(ks[4 + i], 1, mult * nf + emb_dim, mult * nf,
                                   weight_norm=False))
        )
    params["predictor"] = dict(conv=cv.init_conv(ks[8], 1, dim, 2, weight_norm=False))
    return params


def _wm_embed(p: Params, labels: jnp.ndarray) -> jnp.ndarray:
    """Label embedding with torch max_norm=True semantics: rows renormalized
    to unit max-norm at lookup (reference seanet.py:503)."""
    w = p["wm_embed"]
    norm = jnp.sqrt(jnp.sum(w * w, axis=-1, keepdims=True) + 1e-12)
    w = w * jnp.minimum(1.0, 1.0 / norm)
    return w[labels]  # [..., emb_dim]


def _proj(pp: Params, x: jnp.ndarray, cfg: SEANetConfig) -> jnp.ndarray:
    return cv.conv1d(pp["conv"], act(x), causal=cfg.causal, pad_mode=cfg.pad_mode)


def wm_decode(
    p: Params,
    latents: jnp.ndarray,  # [B, F, dimension] quantized latents
    labels: jnp.ndarray,  # [B, F] int {0,1} watermark labels per codec frame
    waveform: jnp.ndarray,  # [B, T, C] original (masked) waveform
    cfg: SEANetConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Watermark decode (reference WMSEANetDecoder.forward, seanet.py:555-600).

    Taps the skip encoder on ``waveform`` at n_up resolutions, fuses each tap
    with the label embedding repeated to that resolution via a 1x1 conv, adds
    it residually into the corresponding decoder stage, then runs the
    detector on the produced audio. Returns (audio [B,T,C], logits [B,F,2]).
    """
    n_up = len(cfg.ratios)
    _, taps = encode(p["skip_encoder"], waveform, cfg, return_taps=True)
    # taps[0] is the full-rate tap the reference discards (seanet.py:561-562)
    used = taps[1:]  # shallow->deep: hop/r0, hop/(r0*r1), ..., 1x (latent rate)

    x = latents
    dp = p["decoder"]
    for stage in range(n_up):
        # stage s fuses the tap whose rate matches the decoder at that depth:
        # deepest tap first; label repeat factor = prod(ratios[:s])
        # (reference seanet.py:563-591)
        tap = used[n_up - 1 - stage]
        rep = 1
        for r in cfg.ratios[:stage]:
            rep *= r
        lab = jnp.repeat(labels, rep, axis=1) if rep > 1 else labels
        emb = _wm_embed(p, lab)  # [B, Ts, emb]
        fused = jnp.concatenate([tap, emb.astype(tap.dtype)], axis=-1)
        fused = _proj(p["projs"][stage], fused, cfg) + x
        if stage == 0:
            x = _decoder_stage0(dp, fused, cfg)
        elif stage < n_up - 1:
            x = _decoder_stage(dp, fused, stage, cfg)
        else:
            # last fusion feeds the remaining up-conv + tail
            x = _decoder_stage(dp, fused, stage, cfg)
            x = _decoder_tail(dp, x, cfg)
    audio = x
    m = encode(p["wm_encoder"], audio, cfg)
    logits = _proj(p["predictor"], m, cfg)
    return audio, logits


def detect_watermark_logits(p: Params, audio: jnp.ndarray, cfg: SEANetConfig) -> jnp.ndarray:
    """Detector head on arbitrary audio (reference wmencodec.py:377-382)."""
    m = encode(p["wm_encoder"], audio, cfg)
    return _proj(p["predictor"], m, cfg)
