"""Meters and eval metrics.

AverageMeter mirrors the reference (``steps/trainer_utils.py:142-158``).
SI-SNR is the in-process codec eval metric (reference
``audiocraft/audiocraft/losses/sisnr.py:39`` and
``solvers/wmcompression.py:196-224``), here as a pure jnp function.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def si_snr(est: jnp.ndarray, ref: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SNR in dB over the last axis ([B, T] or [B, T, C])."""
    if est.ndim == 3:
        est = est[..., 0]
        ref = ref[..., 0]
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    dot = jnp.sum(est * ref, axis=-1, keepdims=True)
    energy = jnp.sum(ref * ref, axis=-1, keepdims=True) + eps
    target = dot / energy * ref
    noise = est - target
    ratio = (jnp.sum(target ** 2, axis=-1) + eps) / (jnp.sum(noise ** 2, axis=-1) + eps)
    return 10.0 * jnp.log10(ratio)
