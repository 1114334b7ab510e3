"""Multi-Scale STFT discriminator (MS-STFT), functional JAX.

Capability parity with the reference
(``audiocraft/audiocraft/adversarial/discriminators/msstftd.py``):
  - per-scale complex STFT (normalized, center=False) split into
    [real ; imag] channels (msstftd.py:85-88),
  - conv2d stack: 1x in-conv, 3 dilated (time) strided convs, 1 post conv,
    all weight-normed, LeakyReLU(0.2) activations, feature maps collected
    for feature-matching (msstftd.py:62-95),
  - shipped config scales n_fft [1024, 2048, 512, 256, 128] with hops
    [256, 512, 128, 64, 32], filters 32, LeakyReLU slope 0.3
    (config solver/compression/default.yaml msstftd section).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..ops import stft as stft_ops

Params = Dict[str, Any]

N_FFTS = (1024, 2048, 512, 256, 128)
HOPS = (256, 512, 128, 64, 32)
LEAKY_SLOPE = 0.3


def _init_conv2d(key, cin, cout, kh, kw) -> Params:
    kkey, bkey = jax.random.split(key)
    fan_in = cin * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kkey, (kh, kw, cin, cout), jnp.float32, -bound, bound)
    g = jnp.sqrt(jnp.sum(w * w, axis=(0, 1, 2), keepdims=True))  # per-Cout
    b = jax.random.uniform(bkey, (cout,), jnp.float32, -bound, bound)
    return dict(v=w, g=g, b=b)


def _conv2d(p: Params, x: jnp.ndarray, stride=(1, 1), dilation=(1, 1)) -> jnp.ndarray:
    """x [B, H, W, C]; 'same'-style padding per reference get_2d_padding."""
    v, g = p["v"], p["g"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-12)
    w = g * v / norm
    kh, kw = w.shape[0], w.shape[1]
    ph = ((kh - 1) * dilation[0]) // 2
    pw = ((kw - 1) * dilation[1]) // 2
    y = jax.lax.conv_general_dilated(
        x, w, stride, [(ph, ph), (pw, pw)], rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + p["b"]


def init_msstftd(key, filters: int = 32, in_channels: int = 1,
                 max_filters: int = 1024, dilations=(1, 2, 4)) -> Params:
    subs = []
    keys = jax.random.split(key, len(N_FFTS))
    for sk in keys:
        ks = jax.random.split(sk, len(dilations) + 3)
        convs = [_init_conv2d(ks[0], 2 * in_channels, filters, 3, 9)]
        in_chs = min(filters, max_filters)
        for i, _ in enumerate(dilations):
            out_chs = min(filters, max_filters)  # filters_scale=1
            convs.append(_init_conv2d(ks[1 + i], in_chs, out_chs, 3, 9))
            in_chs = out_chs
        convs.append(_init_conv2d(ks[-2], in_chs, in_chs, 3, 3))
        subs.append(dict(convs=convs,
                         post=_init_conv2d(ks[-1], in_chs, 1, 3, 3)))
    return dict(subs=subs)


def _sub_forward(sub: Params, x: jnp.ndarray, n_fft: int, hop: int,
                 dilations=(1, 2, 4)) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """x [B, T] -> (logits [B, t, w, 1], fmaps)."""
    spec = stft_ops.stft(x, n_fft, hop, normalized=True)  # [B, freq, frames]
    z = jnp.stack([spec.real, spec.imag], axis=-1)  # [B, freq, frames, 2]
    z = jnp.swapaxes(z, 1, 2)  # [B, frames(t), freq(w), 2]
    fmaps = []
    h = z
    h = jax.nn.leaky_relu(_conv2d(sub["convs"][0], h), LEAKY_SLOPE)
    fmaps.append(h)
    for i, d in enumerate(dilations):
        h = jax.nn.leaky_relu(
            _conv2d(sub["convs"][1 + i], h, stride=(1, 2), dilation=(d, 1)),
            LEAKY_SLOPE,
        )
        fmaps.append(h)
    h = jax.nn.leaky_relu(_conv2d(sub["convs"][-1], h), LEAKY_SLOPE)
    fmaps.append(h)
    logits = _conv2d(sub["post"], h)
    return logits, fmaps


def msstftd_forward(params: Params, wav: jnp.ndarray
                    ) -> Tuple[List[jnp.ndarray], List[List[jnp.ndarray]]]:
    """wav [B, T, C] -> (per-scale logits, per-scale feature maps)."""
    x = wav[..., 0] if wav.ndim == 3 else wav
    logits, fmaps = [], []
    for sub, n_fft, hop in zip(params["subs"], N_FFTS, HOPS):
        lg, fm = _sub_forward(sub, x, n_fft, hop)
        logits.append(lg)
        fmaps.append(fm)
    return logits, fmaps
