"""STFT / mel-spectrogram primitives in pure jnp.

Built to match the torchaudio transforms the reference losses use
(``audiocraft/audiocraft/losses/specloss.py:36-63`` MelSpectrogramWrapper and
``adversarial/discriminators/msstftd.py:57-60`` Spectrogram with
center=False):
  - framing with hann window, center=False,
  - power spectrogram (power=2) for mel, complex output for discriminators,
  - ``normalized=True`` divides by the window L2 norm,
  - HTK mel filterbank (torchaudio default mel_scale='htk', norm=None).

Frames are computed with a strided gather -> [B, frames, n_fft] and one big
rFFT — XLA maps this onto fused gather + FFT without host loops.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    # torch.hann_window periodic=True
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2 * np.pi * n / win_length)).astype(np.float32)


def frame(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """x [..., T] -> [..., n_frames, n_fft], center=False."""
    t = x.shape[-1]
    n_frames = max(1 + (t - n_fft) // hop, 0)
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: Optional[int] = None,
    normalized: bool = False,
) -> jnp.ndarray:
    """x [..., T] -> complex [..., freq, frames] (torchaudio layout)."""
    win_length = win_length or n_fft
    win = hann_window(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        win = np.pad(win, (pad, n_fft - win_length - pad))
    frames = frame(x, n_fft, hop) * win
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    if normalized:
        spec = spec / np.sqrt(np.sum(win ** 2))
    return jnp.swapaxes(spec, -1, -2)


@functools.lru_cache(maxsize=32)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, f_min: float, f_max: Optional[float]
) -> np.ndarray:
    """HTK-scale triangular filters [n_freqs, n_mels] (torchaudio
    melscale_fbanks, mel_scale='htk', norm=None)."""
    f_max = f_max if f_max is not None else sr / 2.0

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sr // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_spectrogram(
    x: jnp.ndarray,
    sr: int,
    n_fft: int,
    hop: int,
    win_length: Optional[int] = None,
    n_mels: int = 64,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    log: bool = False,
    normalized: bool = False,
    floor_level: float = 1e-5,
) -> jnp.ndarray:
    """Reference MelSpectrogramWrapper semantics (specloss.py:48-63):
    reflect-pad (n_fft - hop)//2 each side, pad the tail so all frames are
    full, power-2 spectrogram, mel projection, optional log10 flooring.

    x: [B, T] or [B, T, C] -> [B, n_mels*C, frames].
    """
    if x.ndim == 3:
        x = jnp.moveaxis(x, -1, 1)  # [B, C, T]
    else:
        x = x[:, None, :]
    p = int((n_fft - hop) // 2)
    x = jnp.pad(x, ((0, 0), (0, 0), (p, p)), mode="reflect")
    t = x.shape[-1]
    # pad_for_conv1d: extra right padding so the last window is full
    n_frames = math.ceil(max(t - n_fft, 0) / hop) + 1
    ideal = (n_frames - 1) * hop + n_fft
    if ideal > t:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, ideal - t)))
    spec = stft(x, n_fft, hop, win_length, normalized=normalized)
    power = jnp.abs(spec) ** 2  # [B, C, freq, frames]
    fb = mel_filterbank(sr, n_fft, n_mels, f_min, f_max)
    mel = jnp.einsum("bcft,fm->bcmt", power, fb)
    if log:
        mel = jnp.log10(floor_level + mel)
    b, c, m, fr = mel.shape
    return mel.reshape(b, c * m, fr)
