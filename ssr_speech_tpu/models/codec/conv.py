"""1-D conv primitives for the SEANet codec, with the reference's
"streamable" padding semantics re-derived for XLA.

Parity targets (reference ``audiocraft/audiocraft/modules/conv.py``):
  - extra right-padding so the last conv window is full
    (``get_extra_padding_for_conv1d``, conv.py:47-53),
  - asymmetric left-heavy padding for non-causal convs, left-only for causal
    (``StreamableConv1d.forward``, conv.py:185-201),
  - transposed conv followed by fixed-padding trim
    (``StreamableConvTranspose1d.forward``, conv.py:221-243),
  - weight normalization ``w = g * v / ||v||`` per output channel
    (torch ``weight_norm``; conv.py:21-30).

Layout: activations are [B, T, C] (feature-last, TPU lane dim), conv weights
[K, Cin, Cout] ('WIO'). The torch reference uses [B, C, T]/[Cout, Cin, K];
the converter transposes.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------- init / norm

def init_conv(key, kernel: int, cin: int, cout: int, weight_norm: bool = True) -> Params:
    """torch nn.Conv1d default init (kaiming_uniform a=sqrt(5)) on [K,Cin,Cout].

    With weight norm the gain is per OUTPUT channel (torch weight_norm dim=0
    on a [Cout, Cin, K] tensor), stored broadcastable as [1, 1, Cout]."""
    kw, kb = jax.random.split(key)
    fan_in = cin * kernel
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (kernel, cin, cout), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    if weight_norm:
        g = jnp.sqrt(jnp.sum(w * w, axis=(0, 1), keepdims=True))  # [1,1,Cout]
        return dict(v=w, g=g, b=b)
    return dict(w=w, b=b)


def init_conv_transpose(key, kernel: int, cin: int, cout: int,
                        weight_norm: bool = True) -> Params:
    """Transposed-conv weights in our [K, Cin, Cout] pre-flipped layout.

    torch weight_norm dim=0 on ConvTranspose1d's [Cin, Cout, K] tensor means
    the gain is per INPUT channel: stored broadcastable as [1, Cin, 1]."""
    kw, kb = jax.random.split(key)
    fan_in = cin * kernel  # torch convtr fan_in uses weight.size(1)*k ... keep simple
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (kernel, cin, cout), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    if weight_norm:
        g = jnp.sqrt(jnp.sum(w * w, axis=(0, 2), keepdims=True))  # [1,Cin,1]
        return dict(v=w, g=g, b=b)
    return dict(w=w, b=b)


def conv_weight(p: Params) -> jnp.ndarray:
    """Materialize the conv weight: w = g * v / ||v|| with the norm taken
    over every axis where g has extent 1 (covers both conv and conv-transpose
    torch weight_norm conventions)."""
    if "v" in p:
        v = p["v"]
        g = p["g"]
        axes = tuple(i for i, s in enumerate(g.shape) if s == 1)
        norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True) + 1e-12)
        return g * v / norm
    return p["w"]


# ------------------------------------------------------------------- padding

def extra_padding_for_conv(length: int, eff_kernel: int, stride: int,
                           padding_total: int) -> int:
    """Right padding so the final window is full (reference conv.py:47-53)."""
    n_frames = (length - eff_kernel + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (eff_kernel - padding_total)
    return ideal - length


def _pad1d(x: jnp.ndarray, left: int, right: int, mode: str) -> jnp.ndarray:
    """Pad along time axis (axis 1). Handles reflect on short inputs by
    zero-extending first (reference conv.py:71-88)."""
    if left == 0 and right == 0:
        return x
    if mode == "reflect":
        length = x.shape[1]
        max_pad = max(left, right)
        extra = 0
        if length <= max_pad:
            extra = max_pad - length + 1
            x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
        out = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
        end = out.shape[1] - extra
        return out[:, :end]
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)))


# ------------------------------------------------------------------- forward

def conv1d(
    p: Params,
    x: jnp.ndarray,
    stride: int = 1,
    dilation: int = 1,
    causal: bool = False,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """StreamableConv1d forward (reference conv.py:185-201). x: [B, T, C]."""
    w = conv_weight(p).astype(x.dtype)
    k = w.shape[0]
    eff_k = (k - 1) * dilation + 1
    padding_total = eff_k - stride
    extra = extra_padding_for_conv(x.shape[1], eff_k, stride, padding_total)
    if causal:
        x = _pad1d(x, padding_total, extra, pad_mode)
    else:
        right = padding_total // 2
        left = padding_total - right
        x = _pad1d(x, left, right + extra, pad_mode)
    # output dtype follows x (bf16 training path: the TPU MXU still
    # accumulates products in f32 internally, rounding once at the output);
    # a dtype-changing preferred_element_type would break the conv vjp
    y = jax.lax.conv_general_dilated(
        x, w, (stride,), "VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + p["b"].astype(x.dtype)


def conv_transpose1d(
    p: Params,
    x: jnp.ndarray,
    stride: int,
    causal: bool = False,
    trim_right_ratio: float = 1.0,
) -> jnp.ndarray:
    """StreamableConvTranspose1d forward (reference conv.py:221-243).

    Implemented as an lhs-dilated conv with a time-flipped kernel, which is
    the XLA-native formulation of ConvTranspose1d (out = (T-1)*stride + K),
    followed by the fixed-padding trim.
    """
    w = conv_weight(p).astype(x.dtype)  # [K, Cin, Cout], already flipped layout
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x, w, (1,), [(k - 1, k - 1)], lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    y = y + p["b"].astype(x.dtype)
    padding_total = k - stride
    if causal:
        right = math.ceil(padding_total * trim_right_ratio)
        left = padding_total - right
    else:
        right = padding_total // 2
        left = padding_total - right
    end = y.shape[1] - right
    return y[:, left:end]


# ---------------------------------------------------------------------- LSTM

def init_lstm(key, dim: int, num_layers: int) -> Params:
    """torch nn.LSTM default init: U(-1/sqrt(H), 1/sqrt(H)) on all tensors."""
    layers = []
    bound = 1.0 / math.sqrt(dim)
    for i in range(num_layers):
        k1, k2, k3, k4, key = jax.random.split(key, 5)
        layers.append(dict(
            wih=jax.random.uniform(k1, (4 * dim, dim), jnp.float32, -bound, bound),
            whh=jax.random.uniform(k2, (4 * dim, dim), jnp.float32, -bound, bound),
            bih=jax.random.uniform(k3, (4 * dim,), jnp.float32, -bound, bound),
            bhh=jax.random.uniform(k4, (4 * dim,), jnp.float32, -bound, bound),
        ))
    return dict(layers=layers)


def lstm_skip(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """StreamableLSTM with residual skip (reference
    ``audiocraft/audiocraft/modules/lstm.py:10-26``): y = LSTM(x) + x.

    x: [B, T, C]. Each layer is a standard torch-gate-order LSTM
    (i, f, g, o) run as a ``lax.scan`` over time.
    """
    y = x
    for lp in p["layers"]:
        wih_t = lp["wih"].T  # [C, 4H]
        whh_t = lp["whh"].T
        bias = lp["bih"] + lp["bhh"]
        xw = y @ wih_t.astype(y.dtype) + bias.astype(y.dtype)  # [B, T, 4H]
        H = lp["whh"].shape[1]
        B = x.shape[0]

        def step(carry, xt):
            h, c = carry
            gates = xt + h @ whh_t.astype(xt.dtype)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((B, H), y.dtype), jnp.zeros((B, H), y.dtype))
        _, hs = jax.lax.scan(step, init, jnp.swapaxes(xw, 0, 1))
        y = jnp.swapaxes(hs, 0, 1)
    return y + x
