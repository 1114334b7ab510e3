"""Chunked streaming inference for the causal SEANet codec.

Capability parity with the reference streaming API
(``audiocraft/audiocraft/modules/streaming.py:20-131`` +
``StreamableConv1d/StreamableConvTranspose1d`` partial-buffer support,
``modules/conv.py:165-243``): process audio in fixed-size chunks while
carrying per-layer state, so that the concatenated streamed output equals the
offline pass exactly (causal mode).

TPU-native formulation: instead of the reference's mutable dict-of-tensors
state threaded through a module tree by a context manager, state here is an
explicit pytree mirroring the param tree, and every ``*_step`` function is
pure ``(params, state, chunk) -> (out, state)`` — jit once per chunk shape,
then every subsequent chunk reuses the compiled program (static shapes).

Per-layer state:
  - causal conv (kernel K, stride S, dilation D): the last
    ``(K-1)*D + 1 - S`` input samples (exactly the left-context the offline
    pass reads via causal padding; zeros at stream start),
  - causal transposed conv (trim_right_ratio=1.0): overlap-add tail of
    ``K - S`` output samples carried into the next chunk (bias added only on
    emission so the overlap region is not double-biased),
  - LSTM: the (h, c) carry.

Chunk-length contract: every chunk must be a multiple of the codec hop
(encoder) / one latent frame (decoder) so that each strided conv consumes its
input exactly (no partial windows are buffered across layers; the hop
multiple guarantees ``extra_padding_for_conv1d == 0`` at every stage).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ...config import CodecConfig, SEANetConfig
from . import conv as cv
from . import quantize as q
from . import seanet

Params = Dict[str, Any]
State = Dict[str, Any]

act = seanet.act


# ------------------------------------------------------------ conv primitives

def _conv_state(batch: int, kernel: int, stride: int, dilation: int,
                cin: int, dtype=jnp.float32) -> jnp.ndarray:
    pad = (kernel - 1) * dilation + 1 - stride
    return jnp.zeros((batch, max(pad, 0), cin), dtype)


def conv1d_step(p: Params, x: jnp.ndarray, state: jnp.ndarray,
                stride: int = 1, dilation: int = 1
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Causal streaming conv. ``state`` holds the left context; the chunk
    length must be a stride multiple."""
    assert x.shape[1] % stride == 0, (x.shape, stride)
    xx = jnp.concatenate([state.astype(x.dtype), x], axis=1)
    w = cv.conv_weight(p).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xx, w, (stride,), "VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    y = (y + p["b"]).astype(x.dtype)
    keep = state.shape[1]
    new_state = xx[:, xx.shape[1] - keep:] if keep else state
    return y, new_state


def _convtr_state(batch: int, kernel: int, stride: int, cout: int,
                  dtype=jnp.float32) -> jnp.ndarray:
    return jnp.zeros((batch, kernel - stride, cout), dtype)


def conv_transpose1d_step(p: Params, x: jnp.ndarray, state: jnp.ndarray,
                          stride: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Causal streaming transposed conv (trim_right_ratio=1.0): emits
    ``C*stride`` samples per ``C``-frame chunk, carrying the K-S overlap."""
    w = cv.conv_weight(p).astype(x.dtype)
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x, w, (1,), [(k - 1, k - 1)], lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # [B, (C-1)*stride + k, Cout], bias NOT yet added
    emit_len = x.shape[1] * stride
    tail = k - stride
    y = y.at[:, : tail].add(state.astype(x.dtype))
    out = (y[:, :emit_len] + p["b"]).astype(x.dtype)
    new_state = y[:, emit_len:]
    return out, new_state


def _lstm_state(batch: int, dim: int, n_layers: int, dtype=jnp.float32):
    return [
        (jnp.zeros((batch, dim), dtype), jnp.zeros((batch, dim), dtype))
        for _ in range(n_layers)
    ]


def lstm_skip_step(p: Params, x: jnp.ndarray, state
                   ) -> Tuple[jnp.ndarray, Any]:
    """StreamableLSTM step with carried (h, c) per layer."""
    y = x
    new_state = []
    for lp, (h0, c0) in zip(p["layers"], state):
        wih_t = lp["wih"].T
        whh_t = lp["whh"].T
        bias = lp["bih"] + lp["bhh"]
        xw = y @ wih_t.astype(y.dtype) + bias.astype(y.dtype)

        def step(carry, xt):
            h, c = carry
            gates = xt + h @ whh_t.astype(xt.dtype)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        (h1, c1), hs = jax.lax.scan(step, (h0.astype(y.dtype), c0.astype(y.dtype)),
                                    jnp.swapaxes(xw, 0, 1))
        new_state.append((h1, c1))
        y = jnp.swapaxes(hs, 0, 1)
    return y + x, new_state


def _resblock_state(batch: int, cfg: SEANetConfig, dim: int, dilation: int,
                    dtype=jnp.float32) -> State:
    hidden = dim // cfg.compress
    return dict(
        conv1=_conv_state(batch, cfg.residual_kernel_size, 1, dilation, dim, dtype),
        conv2=_conv_state(batch, 1, 1, 1, hidden, dtype),
    )


def resblock_step(p: Params, x: jnp.ndarray, state: State,
                  dilation: int) -> Tuple[jnp.ndarray, State]:
    h, s1 = conv1d_step(p["conv1"], act(x), state["conv1"], dilation=dilation)
    h, s2 = conv1d_step(p["conv2"], act(h), state["conv2"])
    return x + h, dict(conv1=s1, conv2=s2)


# -------------------------------------------------------------------- encoder

def init_encoder_state(cfg: SEANetConfig, batch: int = 1,
                       dtype=jnp.float32) -> State:
    assert cfg.causal, "streaming requires the causal codec mode"
    ratios = list(reversed(cfg.ratios))
    mult = 1
    groups = []
    for ratio in ratios:
        dim = mult * cfg.n_filters
        res = [
            _resblock_state(batch, cfg, dim, cfg.dilation_base ** j, dtype)
            for j in range(cfg.n_residual_layers)
        ]
        down = _conv_state(batch, ratio * 2, ratio, 1, dim, dtype)
        groups.append(dict(res=res, down=down))
        mult *= 2
    state: State = dict(
        conv_in=_conv_state(batch, cfg.kernel_size, 1, 1, cfg.channels, dtype),
        groups=groups,
        conv_out=_conv_state(batch, cfg.last_kernel_size, 1, 1,
                             mult * cfg.n_filters, dtype),
    )
    if cfg.lstm:
        state["lstm"] = _lstm_state(batch, mult * cfg.n_filters, cfg.lstm, dtype)
    return state


def encode_step(p: Params, state: State, chunk: jnp.ndarray,
                cfg: SEANetConfig, return_taps: bool = False):
    """chunk [B, C, channels] (C a hop multiple) -> latents [B, C/hop, dim].

    With ``return_taps`` also returns the per-resolution intermediates the
    watermark decoder fuses (same boundaries as ``seanet.encode``)."""
    new: State = dict(groups=[])
    taps = []
    h, new["conv_in"] = conv1d_step(p["conv_in"], chunk, state["conv_in"])
    enc_ratios = list(reversed(cfg.ratios))
    for i, g in enumerate(p["groups"]):
        gs = state["groups"][i]
        ns = dict(res=[])
        for j, rp in enumerate(g["res"]):
            h, rs = resblock_step(rp, h, gs["res"][j], cfg.dilation_base ** j)
            ns["res"].append(rs)
        if return_taps:
            taps.append(h)
        h, ns["down"] = conv1d_step(g["down"], act(h), gs["down"],
                                    stride=enc_ratios[i])
        new["groups"].append(ns)
    if "lstm" in p:
        h, new["lstm"] = lstm_skip_step(p["lstm"], h, state["lstm"])
    h, new["conv_out"] = conv1d_step(p["conv_out"], act(h), state["conv_out"])
    if return_taps:
        taps.append(h)
        return h, taps, new
    return h, new


# -------------------------------------------------------------------- decoder

def init_decoder_state(cfg: SEANetConfig, batch: int = 1,
                       dtype=jnp.float32) -> State:
    assert cfg.causal, "streaming requires the causal codec mode"
    assert cfg.trim_right_ratio >= 1.0, \
        "streaming decode requires trim_right_ratio=1.0 (fully causal upconvs)"
    mult = int(2 ** len(cfg.ratios))
    state: State = dict(
        conv_in=_conv_state(batch, cfg.kernel_size, 1, 1, cfg.dimension, dtype),
        groups=[],
    )
    if cfg.lstm:
        state["lstm"] = _lstm_state(batch, mult * cfg.n_filters, cfg.lstm, dtype)
    for i, ratio in enumerate(cfg.ratios):
        dim_out = mult * cfg.n_filters // 2
        up = _convtr_state(batch, ratio * 2, ratio, dim_out, dtype)
        res = [
            _resblock_state(batch, cfg, dim_out, cfg.dilation_base ** j, dtype)
            for j in range(cfg.n_residual_layers)
        ]
        state["groups"].append(dict(up=up, res=res))
        mult //= 2
    state["conv_out"] = _conv_state(batch, cfg.last_kernel_size, 1, 1,
                                    cfg.n_filters, dtype)
    return state


def decode_step(p: Params, state: State, z: jnp.ndarray,
                cfg: SEANetConfig) -> Tuple[jnp.ndarray, State]:
    """z [B, F, dimension] -> waveform chunk [B, F*hop, channels]."""
    new: State = dict(groups=[dict(res=[]) for _ in cfg.ratios])
    h, new["conv_in"] = conv1d_step(p["conv_in"], z, state["conv_in"])
    if "lstm" in p:
        h, new["lstm"] = lstm_skip_step(p["lstm"], h, state["lstm"])
    for i, ratio in enumerate(cfg.ratios):
        g = p["groups"][i]
        if i > 0:
            prev = p["groups"][i - 1]
            for j, rp in enumerate(prev["res"]):
                h, rs = resblock_step(rp, h, state["groups"][i - 1]["res"][j],
                                      cfg.dilation_base ** j)
                new["groups"][i - 1]["res"].append(rs)
        h, up_s = conv_transpose1d_step(g["up"], act(h), state["groups"][i]["up"],
                                        stride=ratio)
        new["groups"][i]["up"] = up_s
    for j, rp in enumerate(p["groups"][-1]["res"]):
        h, rs = resblock_step(rp, h, state["groups"][-1]["res"][j],
                              cfg.dilation_base ** j)
        new["groups"][-1]["res"].append(rs)
    h, new["conv_out"] = conv1d_step(p["conv_out"], act(h), state["conv_out"])
    if cfg.final_activation == "Tanh":
        h = jnp.tanh(h)
    return h, new


# --------------------------------------------------------- watermark decoder

def init_wm_decoder_state(cfg: SEANetConfig, batch: int = 1,
                          dtype=jnp.float32) -> State:
    """State for streaming ``wm_decode``: skip-encoder, decoder and the
    detector encoder streams run in lockstep."""
    return dict(
        skip=init_encoder_state(cfg, batch, dtype),
        dec=init_decoder_state(cfg, batch, dtype),
        wm_enc=init_encoder_state(cfg, batch, dtype),
    )


def wm_decode_step(
    p: Params,  # wmdecoder params (seanet.init_wm_decoder layout)
    state: State,
    latents: jnp.ndarray,  # [B, F, dim] quantized latents for this chunk
    labels: jnp.ndarray,  # [B, F] int {0,1} watermark labels
    wav_chunk: jnp.ndarray,  # [B, F*hop, C] original (masked) waveform chunk
    cfg: SEANetConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, State]:
    """Streaming WMSEANetDecoder step (offline: ``seanet.wm_decode``).

    The skip-encoder taps, label-embedding fusions (1x1 projections —
    stateless) and decoder stages all operate at chunk-aligned rates, so the
    same per-layer states as the plain streams suffice. Returns
    (audio [B, F*hop, C], detector logits [B, F, 2], state).
    """
    n_up = len(cfg.ratios)
    _, taps, skip_s = encode_step(p["skip_encoder"], state["skip"], wav_chunk,
                                  cfg, return_taps=True)
    used = taps[1:]  # drop the full-rate tap like the offline path

    dp = p["decoder"]
    ds = state["dec"]
    new_dec: State = dict(groups=[dict(res=[]) for _ in cfg.ratios])
    x = latents
    for stage in range(n_up):
        tap = used[n_up - 1 - stage]
        rep = 1
        for r in cfg.ratios[:stage]:
            rep *= r
        lab = jnp.repeat(labels, rep, axis=1) if rep > 1 else labels
        emb = seanet._wm_embed(p, lab)
        fused = jnp.concatenate([tap, emb.astype(tap.dtype)], axis=-1)
        x = seanet._proj(p["projs"][stage], fused, cfg) + x
        if stage == 0:
            x, new_dec["conv_in"] = conv1d_step(dp["conv_in"], x,
                                                ds["conv_in"])
            if "lstm" in dp:
                x, new_dec["lstm"] = lstm_skip_step(dp["lstm"], x, ds["lstm"])
        else:
            prev = dp["groups"][stage - 1]
            for j, rp in enumerate(prev["res"]):
                x, rs = resblock_step(rp, x, ds["groups"][stage - 1]["res"][j],
                                      cfg.dilation_base ** j)
                new_dec["groups"][stage - 1]["res"].append(rs)
        x, up_s = conv_transpose1d_step(dp["groups"][stage]["up"], act(x),
                                        ds["groups"][stage]["up"],
                                        stride=cfg.ratios[stage])
        new_dec["groups"][stage]["up"] = up_s
    for j, rp in enumerate(dp["groups"][-1]["res"]):
        x, rs = resblock_step(rp, x, ds["groups"][-1]["res"][j],
                              cfg.dilation_base ** j)
        new_dec["groups"][-1]["res"].append(rs)
    x, new_dec["conv_out"] = conv1d_step(dp["conv_out"], act(x),
                                         ds["conv_out"])
    if cfg.final_activation == "Tanh":
        x = jnp.tanh(x)
    audio = x

    m, wm_s = encode_step(p["wm_encoder"], state["wm_enc"], audio, cfg)
    logits = seanet._proj(p["predictor"], m, cfg)  # 1x1 conv: stateless
    return audio, logits, dict(skip=skip_s, dec=new_dec, wm_enc=wm_s)


# ------------------------------------------------------------- codec facade

@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode_chunk_jit(p, s, x, *, cfg: SEANetConfig):
    return encode_step(p, s, x, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _decode_chunk_jit(p, s, z, *, cfg: SEANetConfig):
    return decode_step(p, s, z, cfg)


class StreamingCodec:
    """Stateful convenience wrapper: feed waveform chunks, get codes; feed
    codes, get waveform — the chunked equivalent of ``wmencodec.encode`` /
    ``decode`` for live use (reference streaming entry points
    ``modules/streaming.py:20-131``).

    The jitted chunk programs are MODULE-level with the config static, so a
    fresh ``StreamingCodec`` (one per live stream) reuses the compiled code —
    per-instance ``jax.jit(lambda ...)`` wrappers recompiled on every stream
    and put seconds of XLA compile on the first-audio path
    (tools/stream_probe.py)."""

    def __init__(self, params: Params, cfg: CodecConfig, batch: int = 1,
                 dtype=jnp.float32):
        self.params = params
        self.cfg = cfg
        self.enc_state = init_encoder_state(cfg.seanet, batch, dtype)
        self.dec_state = init_decoder_state(cfg.seanet, batch, dtype)

    def encode_chunk(self, wav_chunk) -> jnp.ndarray:
        """wav [B, C, channels], C a hop multiple -> codes [B, K, C/hop]."""
        assert wav_chunk.shape[1] % self.cfg.hop_length == 0, \
            (wav_chunk.shape, self.cfg.hop_length)
        emb, self.enc_state = _encode_chunk_jit(
            self.params["encoder"], self.enc_state, wav_chunk,
            cfg=self.cfg.seanet)
        return q.rvq_encode(self.params["quantizer"], emb)

    def decode_chunk(self, codes) -> jnp.ndarray:
        """codes [B, K, F] -> waveform [B, F*hop, channels]."""
        latents = q.rvq_decode(self.params["quantizer"], codes)
        out, self.dec_state = _decode_chunk_jit(
            self.params["decoder"], self.dec_state, latents,
            cfg=self.cfg.seanet)
        return out


# ---------------------------------------------------------- batched lanes

@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def _warm_step_jit(p, s, z, *, cfg: SEANetConfig):
    return decode_step(p, s, z, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def _lane_decode_jit(p, s, z, active, *, cfg: SEANetConfig):
    out, new_s = decode_step(p, s, z, cfg)

    def keep(new, old):
        m = active.reshape((active.shape[0],) + (1,) * (new.ndim - 1))
        return jnp.where(m, new, old)

    return out, jax.tree.map(keep, new_s, s)


@functools.partial(jax.jit, donate_argnums=(0,))
def _lane_reset_jit(s, mask):
    def zero(leaf):
        m = mask.reshape((mask.shape[0],) + (1,) * (leaf.ndim - 1))
        return jnp.where(m, jnp.zeros_like(leaf), leaf)

    return jax.tree.map(zero, s)


@functools.partial(jax.jit, donate_argnums=(0,))
def _lane_scatter_jit(s, warm, lane):
    return jax.tree.map(
        lambda leaf, w: jax.lax.dynamic_update_index_in_dim(
            leaf, w[0].astype(leaf.dtype), lane, 0), s, warm)


class LaneDecoder:
    """``n_lanes`` independent causal decoder streams advanced by ONE batched
    program per chunk — the multi-client counterpart of
    :class:`StreamingCodec` (which runs one stream per instance and costs one
    host dispatch PER stream per chunk; at 8 serving lanes those dispatches
    dominated the chunk budget, tools/stream_serve_probe.py).

    ``step`` advances only the lanes marked ``active`` — inactive rows keep
    their conv/LSTM state bit-exactly (``jnp.where`` on every state leaf), so
    callers batch whichever subset of lanes has a full chunk pending.
    ``reset`` re-zeroes a lane's state for reuse by the next stream (zeros ==
    a freshly initialized stream state)."""

    def __init__(self, params: Params, cfg: CodecConfig, n_lanes: int,
                 dtype=jnp.float32):
        if not cfg.seanet.causal:
            raise ValueError("LaneDecoder needs a causal codec config")
        self.params, self.cfg = params, cfg
        self.n_lanes = n_lanes
        self.dtype = dtype
        self.state = init_decoder_state(cfg.seanet, n_lanes, dtype)

    def reset(self, lane_mask) -> None:
        """Zero the state rows where ``lane_mask`` [n_lanes] is True."""
        self.state = _lane_reset_jit(self.state, jnp.asarray(lane_mask))

    def warm_lane(self, lane: int, codes, chunk: int = 50) -> int:
        """Advance lane ``lane`` from a FRESH state over the leading
        ``(T // chunk) * chunk`` frames of ``codes`` [K, T] at batch=1, then
        scatter the warmed state into the lane's row.  Prompt warm-up this
        way costs one stream's compute; running it through :meth:`step`
        would burn a full ``n_lanes``-wide batch per chunk with every other
        lane masked (measured 3x worse p50 TTFA, tools/stream_serve_probe.py).
        Returns the number of frames consumed — the remainder (< ``chunk``)
        is the caller's to feed through :meth:`step`, where it shares a step
        with the first generated frames."""
        T = codes.shape[1]
        n = (T // chunk) * chunk
        if n == 0:
            return 0
        s = init_decoder_state(self.cfg.seanet, 1, self.dtype)
        for i in range(0, n, chunk):
            latents = q.rvq_decode(self.params["quantizer"],
                                   jnp.asarray(codes[None, :, i:i + chunk]))
            _, s = _warm_step_jit(self.params["decoder"], s, latents,
                                  cfg=self.cfg.seanet)
        self.state = _lane_scatter_jit(self.state, s, lane)
        return n

    def step(self, codes, active) -> jnp.ndarray:
        """codes [n_lanes, K, f] -> waveform [n_lanes, f*hop, channels].
        Rows with ``active`` False keep their state; their output rows are
        garbage (callers discard them). Does NOT block: the returned array is
        a device handle, so consecutive steps pipeline on the device."""
        latents = q.rvq_decode(self.params["quantizer"], codes)
        out, self.state = _lane_decode_jit(
            self.params["decoder"], self.state, latents,
            jnp.asarray(active), cfg=self.cfg.seanet)
        return out
