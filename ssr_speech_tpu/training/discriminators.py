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

import functools

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
    """x [B, H, W, C]; 'same'-style padding per reference get_2d_padding.

    Follows the activation dtype: the weight-norm math runs in f32, the conv
    multiplies in ``x.dtype`` (the TPU MXU accumulates bf16 products in f32
    internally, rounding once at the output) — so a bf16 activation stream halves the HBM
    traffic of the fmap tensors (the codec-GAN step is bandwidth-bound,
    BENCHMARKS.md roofline) while keeping f32 reductions."""
    v, g = p["v"], p["g"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-12)
    w = (g * v / norm).astype(x.dtype)
    kh, kw = w.shape[0], w.shape[1]
    ph = ((kh - 1) * dilation[0]) // 2
    pw = ((kw - 1) * dilation[1]) // 2
    y = jax.lax.conv_general_dilated(
        x, w, stride, [(ph, ph), (pw, pw)], rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("filters", "in_channels",
                                              "max_filters", "dilations",
                                              "n_scales"))
def init_msstftd(key, filters: int = 32, in_channels: int = 1,
                 max_filters: int = 1024, dilations=(1, 2, 4),
                 n_scales: int = len(N_FFTS)) -> Params:
    """``n_scales`` < 5 keeps the first N of the shipped n_fft list — the
    reference's ``msstftd.n_ffts`` config is a plain list, so a smaller
    multi-scale family is config-space-equivalent (msstftd.py:104-121);
    ``msstftd_forward`` zips the sub-discriminators against N_FFTS, so the
    forward follows the init geometry automatically."""
    subs = []
    keys = jax.random.split(key, n_scales)
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
    """x [B, T] -> (logits [B, t, w, 1], fmaps). The STFT itself always runs
    in f32 (phase accuracy); the conv stack follows ``x.dtype``."""
    spec = stft_ops.stft(x.astype(jnp.float32), n_fft, hop, normalized=True)
    z = jnp.stack([spec.real, spec.imag], axis=-1)  # [B, freq, frames, 2]
    z = jnp.swapaxes(z, 1, 2).astype(x.dtype)  # [B, frames(t), freq(w), 2]
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


# --------------------------------------------------------------- MSD / MPD

def _init_conv1d(key, cin, cout, k, groups=1) -> Params:
    kkey, bkey = jax.random.split(key)
    fan_in = (cin // groups) * k
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kkey, (k, cin // groups, cout), jnp.float32, -bound, bound)
    g = jnp.sqrt(jnp.sum(w * w, axis=(0, 1), keepdims=True))
    b = jax.random.uniform(bkey, (cout,), jnp.float32, -bound, bound)
    return dict(v=w, g=g, b=b)


def _conv1d_wn(p: Params, x: jnp.ndarray, stride=1, padding=0,
               groups: int = 1) -> jnp.ndarray:
    """x [B, T, C] weight-normed grouped conv1d ('same'-style static pad);
    follows the activation dtype like :func:`_conv2d` (f32 accumulation)."""
    v, g = p["v"], p["g"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
    w = (g * v / norm).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (stride,), [(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    return y + p["b"].astype(x.dtype)


def _msd_layout(filters=16, max_filters=1024, downsample_scales=(4, 4, 4, 4),
                kernel_sizes=(5, 3)):
    """Static (cin, cout, k, stride, pad, groups) per layer of one scale."""
    layers = [(1, filters, int(np.prod(kernel_sizes)), 1,
               (int(np.prod(kernel_sizes)) - 1) // 2, 1)]
    in_chs = filters
    for scale in downsample_scales:
        out_chs = min(in_chs * scale, max_filters)
        k = scale * 10 + 1
        layers.append((in_chs, out_chs, k, scale, (k - 1) // 2, in_chs // 4))
        in_chs = out_chs
    out_chs = min(in_chs * 2, max_filters)
    layers.append((in_chs, out_chs, kernel_sizes[0], 1,
                   (kernel_sizes[0] - 1) // 2, 1))
    post = (out_chs, 1, kernel_sizes[1], 1, (kernel_sizes[1] - 1) // 2, 1)
    return layers, post


def init_msd(key, n_scales: int = 3) -> Params:
    """Multi-Scale waveform discriminator (reference
    adversarial/discriminators/msd.py:17-120; config msd section: filters 16,
    inner groups cin//4, downsample scales 4,4,4,4)."""
    layers, post = _msd_layout()
    subs = []
    for sk in jax.random.split(key, n_scales):
        ks = jax.random.split(sk, len(layers) + 1)
        convs = [_init_conv1d(ks[i], cin, cout, k, groups=gr)
                 for i, (cin, cout, k, _, _, gr) in enumerate(layers)]
        subs.append(dict(convs=convs,
                         post=_init_conv1d(ks[-1], post[0], post[1], post[2])))
    return dict(subs=subs)


def msd_forward(params: Params, wav: jnp.ndarray):
    """wav [B, T, C]; scale i sees the waveform avg-pooled i times
    (msd.py:113-120, AvgPool1d(4, stride 2, pad 2))."""
    layers, post = _msd_layout()
    x = wav if wav.ndim == 3 else wav[..., None]
    logits, fmaps = [], []
    for i, sub in enumerate(params["subs"]):
        if i > 0:
            xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)))
            x = jax.lax.reduce_window(
                xp, 0.0, jax.lax.add, (1, 4, 1), (1, 2, 1), "VALID") / 4.0
        h = x
        fm = []
        for p, (_, _, _, stride, pad, gr) in zip(sub["convs"], layers):
            h = jax.nn.leaky_relu(_conv1d_wn(p, h, stride, pad, gr), 0.2)
            fm.append(h)
        lg = _conv1d_wn(sub["post"], h, post[3], post[4])
        fm.append(lg)
        logits.append(lg)
        fmaps.append(fm)
    return logits, fmaps


MPD_PERIODS = (2, 3, 5, 7, 11)


def init_mpd(key, periods=MPD_PERIODS, n_layers: int = 5,
             kernel_sizes=(5, 3), filters: int = 8,
             filters_scale: int = 4, max_filters: int = 1024) -> Params:
    """Multi-Period discriminator (reference mpd.py:20-110; config mpd:
    filters 8, scale 4, 5 layers, stride 3)."""
    subs = []
    for sk in jax.random.split(key, len(periods)):
        ks = jax.random.split(sk, n_layers + 1)
        convs = []
        in_chs = 1
        for i in range(n_layers):
            out_chs = min(filters * (filters_scale ** (i + 1)), max_filters)
            convs.append(_init_conv2d(ks[i], in_chs, out_chs, kernel_sizes[0], 1))
            in_chs = out_chs
        subs.append(dict(convs=convs,
                         post=_init_conv2d(ks[-1], in_chs, 1, kernel_sizes[1], 1)))
    return dict(subs=subs)


def mpd_forward(params: Params, wav: jnp.ndarray, periods=MPD_PERIODS,
                stride: int = 3):
    """wav [B, T, C] -> per-period logits/fmaps; 1d signal folded to 2d
    [t/period, period] (mpd.py:58-75); last conv layer uses stride 1."""
    x0 = wav[..., 0] if wav.ndim == 3 else wav
    logits, fmaps = [], []
    for period, sub in zip(periods, params["subs"]):
        b, t = x0.shape
        n_pad = (period - t % period) % period
        x = jnp.pad(x0, ((0, 0), (0, n_pad)), mode="reflect") if n_pad else x0
        h = x.reshape(b, -1, period, 1)  # [B, t/p, p, C=1] (NHWC)
        fm = []
        n = len(sub["convs"])
        for i, p in enumerate(sub["convs"]):
            eff_stride = 1 if i == n - 1 else stride
            h = jax.nn.leaky_relu(_conv2d(p, h, stride=(eff_stride, 1)), 0.2)
            fm.append(h)
        lg = _conv2d(sub["post"], h)
        fm.append(lg)
        logits.append(lg)
        fmaps.append(fm)
    return logits, fmaps


def get_adversary(name: str, key, **kwargs):
    """Adversary registry (reference solvers/builders.py:202-240):
    returns (params, forward_fn)."""
    if name == "msstftd":
        return init_msstftd(key, **kwargs), msstftd_forward
    if name == "msd":
        return init_msd(key, **kwargs), msd_forward
    if name == "mpd":
        return init_mpd(key, **kwargs), mpd_forward
    raise ValueError(name)
