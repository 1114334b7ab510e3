"""Codec training losses: time/spectral reconstruction, multi-scale mel,
adversarial criteria, feature matching, and the gradient Balancer.

Capability parity (reference ``audiocraft/audiocraft/losses/`` and
``adversarial/losses.py``):
  - L1/L2 time-domain losses (builders.py:182-199),
  - MelSpectrogramL1Loss / MultiScaleMelSpectrogramLoss with the shipped
    config (specloss.py:66-149; config solver/compression/default.yaml:
    msspec range 6..11, 64 mels, f_min 64, normalized, alphas off),
  - hinge adversarial criteria (losses.py:169-199) and FeatureMatchingLoss
    (losses.py:201-228),
  - Balancer (balancer.py:14-136): per-loss gradient-norm EMA and rescaling
    so each loss contributes its configured fraction of a unit-norm gradient.
    In JAX this is one ``jax.grad`` per loss w.r.t. the model OUTPUT (cheap),
    then a single pullback of the combined cotangent through the model.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import stft as stft_ops


def l1_loss(x, y):
    # dtype=f32: accumulate in f32 even over bf16 operands (the bf16
    # codec-GAN compute path feeds bf16 fmaps through feature matching)
    return jnp.mean(jnp.abs(x - y), dtype=jnp.float32)


def l2_loss(x, y):
    d = (x - y).astype(jnp.float32)
    return jnp.mean(d * d, dtype=jnp.float32)


def mel_l1_loss(x, y, sr: int, n_fft: int = 1024, hop: int = 256,
                win_length: int = 1024, n_mels: int = 64, f_min: float = 64.0,
                f_max=None, floor_level: float = 1e-5):
    """MelSpectrogramL1Loss (specloss.py:66-93), log-mel L1."""
    sx = stft_ops.mel_spectrogram(x, sr, n_fft, hop, win_length, n_mels,
                                  f_min, f_max, log=True, floor_level=floor_level)
    sy = stft_ops.mel_spectrogram(y, sr, n_fft, hop, win_length, n_mels,
                                  f_min, f_max, log=True, floor_level=floor_level)
    return l1_loss(sx, sy)


def multiscale_mel_loss(
    x, y, sr: int, range_start: int = 6, range_end: int = 11,
    n_mels: int = 64, f_min: float = 64.0, f_max=None,
    normalized: bool = True, alphas: bool = False, floor_level: float = 1e-5,
):
    """MultiScaleMelSpectrogramLoss (specloss.py:96-149): per scale,
    L1 on linear mel + alpha * MSE on log mel."""
    loss = 0.0
    total = 0.0
    for i in range(range_start, range_end):
        n_fft = 2 ** i
        hop = n_fft // 4
        alpha = (2 ** i - 1) ** 0.5 if alphas else 1.0
        lin_x = stft_ops.mel_spectrogram(x, sr, n_fft, hop, n_fft, n_mels,
                                         f_min, f_max, log=False,
                                         normalized=normalized,
                                         floor_level=floor_level)
        lin_y = stft_ops.mel_spectrogram(y, sr, n_fft, hop, n_fft, n_mels,
                                         f_min, f_max, log=False,
                                         normalized=normalized,
                                         floor_level=floor_level)
        log_x = jnp.log10(floor_level + lin_x)
        log_y = jnp.log10(floor_level + lin_y)
        loss = loss + l1_loss(lin_x, lin_y) + alpha * l2_loss(log_x, log_y)
        total += alpha + 1.0
    if normalized:
        loss = loss / total
    return loss


def mrstft_loss(x, y, n_ffts=(1024, 2048, 512), factor_sc: float = 0.5,
                factor_mag: float = 0.5, eps: float = 1e-8):
    """Multi-resolution STFT loss (reference losses/stftloss.py; config
    mrstft factor_sc/.factor_mag 0.5): spectral-convergence + log-magnitude
    L1 over several resolutions."""
    loss = 0.0
    if x.ndim == 3:
        x = x[..., 0]
        y = y[..., 0]
    for n_fft in n_ffts:
        hop = n_fft // 4
        sx = jnp.abs(stft_ops.stft(x, n_fft, hop)) + eps
        sy = jnp.abs(stft_ops.stft(y, n_fft, hop)) + eps
        sc = jnp.linalg.norm(sy - sx) / (jnp.linalg.norm(sy) + eps)
        mag = l1_loss(jnp.log(sx), jnp.log(sy))
        loss = loss + factor_sc * sc + factor_mag * mag
    return loss / len(n_ffts)


# ------------------------------------------------------------- adversarial

def hinge_gen_loss(logits):
    """Generator hinge: -mean(D(fake)) (losses.py:193-196)."""
    return -jnp.mean(logits, dtype=jnp.float32)


def hinge_real_loss(logits):
    return -jnp.mean(jnp.minimum(logits - 1.0, 0.0), dtype=jnp.float32)


def hinge_fake_loss(logits):
    return -jnp.mean(jnp.minimum(-logits - 1.0, 0.0), dtype=jnp.float32)


def mse_gen_loss(logits):
    return l2_loss(logits, jnp.ones_like(logits))


def mse_real_loss(logits):
    return l2_loss(logits, jnp.ones_like(logits))


def mse_fake_loss(logits):
    return l2_loss(logits, jnp.zeros_like(logits))


def feature_matching_loss(fmaps_fake: List[jnp.ndarray],
                          fmaps_real: List[jnp.ndarray]) -> jnp.ndarray:
    """L1 feature matching averaged over layers (losses.py:214-228)."""
    loss = 0.0
    for ff, fr in zip(fmaps_fake, fmaps_real):
        loss = loss + l1_loss(ff, fr)
    return loss / max(len(fmaps_fake), 1)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over all positions (watermark classifier loss,
    solvers/wmcompression.py:106)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - tgt)


# ----------------------------------------------------------------- balancer

class BalancerState(NamedTuple):
    ema: Dict[str, jnp.ndarray]  # EMA of per-loss grad norms
    count: jnp.ndarray  # number of updates (for EMA bias correction)


def init_balancer(names) -> BalancerState:
    return BalancerState(
        ema={n: jnp.zeros(()) for n in names}, count=jnp.zeros(())
    )


def balancer_cotangent(
    state: BalancerState,
    grads: Dict[str, jnp.ndarray],
    weights: Dict[str, float],
    losses: Dict[str, jnp.ndarray],
    *,
    total_norm: float = 1.0,
    ema_decay: float = 0.999,
    per_batch_item: bool = True,
    epsilon: float = 1e-12,
) -> Tuple[jnp.ndarray, BalancerState, jnp.ndarray]:
    """Combine per-loss output-gradients into one cotangent
    (reference balancer.py:77-136).

    grads[name]: d loss_name / d model_output, all same shape. Returns
    (cotangent, new_state, effective_loss). flashy's running averager is
    ``avg = avg*decay + v*(1-decay)`` then bias-corrected by
    ``1 - decay**count``.
    """
    norms = {}
    for name, g in grads.items():
        if per_batch_item:
            axes = tuple(range(1, g.ndim))
            norms[name] = jnp.mean(jnp.sqrt(jnp.sum(g * g, axis=axes) + 0.0))
        else:
            norms[name] = jnp.sqrt(jnp.sum(g * g))
    count = state.count + 1.0
    bias = 1.0 - ema_decay ** count
    new_ema = {
        n: state.ema[n] * ema_decay + norms[n] * (1.0 - ema_decay) for n in norms
    }
    avg_norms = {n: new_ema[n] / bias for n in norms}

    total_weights = sum(weights[n] for n in norms)
    out = None
    eff_loss = 0.0
    for name, avg in avg_norms.items():
        ratio = weights[name] / total_weights
        scale = ratio * total_norm / (epsilon + avg)
        contrib = grads[name] * scale
        out = contrib if out is None else out + contrib
        eff_loss = eff_loss + scale * jax.lax.stop_gradient(losses[name])
    return out, BalancerState(new_ema, count), eff_loss
