"""icefall "scaling" toolbox, TPU-native: the activation/normalization pieces
the reference transformer can be configured with.

Capability parity (reference ``models/modules/scaling.py``; the shipped SSR
config selects plain LayerNorm+ReLU at ``models/ssr.py:160-168``, but the
transformer constructor accepts these — ``models/modules/transformer.py:
12-13,112-176``):

  - :func:`double_swish` — ``x * sigmoid(x - 1)`` (scaling.py:1161-1227;
    exact f32 derivative instead of the reference's uint8-compressed one,
    which exists purely to save activation memory under torch autograd —
    ``jax.checkpoint`` makes that trick unnecessary),
  - :func:`basic_norm` — ``x * (mean(x², ch) + exp(eps))^-0.5`` with a
    learnable log-eps (scaling.py:366-434),
  - :func:`activation_balancer` — identity in the forward pass whose
    BACKWARD nudges channel statistics: the gradient is modified by
    ``factor = sign_factor + scale_factor*(1[x>0] - 0.5)`` and
    ``grad -= |grad| * factor`` (ActivationBalancerFunction,
    scaling.py:41-80), with the scale/sign factors computed from channel
    abs-means / positive fractions (scaling.py:82-146),
  - :func:`balanced_double_swish` / :func:`balanced_basic_norm` — the
    composition classes (transformer.py:134-176, scaling.py:1230-1243),
  - :func:`scaled_init` — ScaledLinear/ScaledConv semantics: torch default
    init times ``initial_scale`` (scaling.py:556-641).

All pure functions; the balancer's gradient surgery uses ``jax.custom_vjp``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def double_swish(x: jnp.ndarray) -> jnp.ndarray:
    """double_swish(x) = x * sigmoid(x - 1) (scaling.py:1161)."""
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf - 1.0)).astype(x.dtype)


def basic_norm(x: jnp.ndarray, log_eps: jnp.ndarray,
               channel_dim: int = -1) -> jnp.ndarray:
    """BasicNorm eval forward (scaling.py:415-434): no weight/bias, the
    learnable ballast replaces LayerNorm's trick of burning a channel."""
    xf = x.astype(jnp.float32)
    scales = (jnp.mean(xf * xf, axis=channel_dim, keepdims=True)
              + jnp.exp(log_eps)) ** -0.5
    return (xf * scales).astype(x.dtype)


def init_basic_norm(eps: float = 0.25) -> jnp.ndarray:
    return jnp.log(jnp.asarray(eps, jnp.float32))


def compute_scale_factor(x: jnp.ndarray, channel_dim: int, min_abs: float,
                         max_abs: float, gain_factor: float,
                         max_factor: float) -> jnp.ndarray:
    """scaling.py:82-112."""
    if channel_dim < 0:
        channel_dim += x.ndim
    dims = tuple(d for d in range(x.ndim) if d != channel_dim)
    x_abs_mean = jnp.mean(jnp.abs(x), axis=dims).astype(jnp.float32)
    below = (jnp.clip((min_abs - x_abs_mean) * (gain_factor / min_abs),
                      0, max_factor) if min_abs != 0.0 else 0.0)
    above = jnp.clip((x_abs_mean - max_abs) * (gain_factor / max_abs),
                     0, max_factor)
    return below - above


def compute_sign_factor(x: jnp.ndarray, channel_dim: int, min_positive: float,
                        max_positive: float, gain_factor: float,
                        max_factor: float) -> jnp.ndarray:
    """scaling.py:114-146."""
    if channel_dim < 0:
        channel_dim += x.ndim
    dims = tuple(d for d in range(x.ndim) if d != channel_dim)
    prop_pos = jnp.mean((x > 0).astype(jnp.float32), axis=dims)
    f1 = (jnp.clip((min_positive - prop_pos) * (gain_factor / min_positive),
                   0, max_factor) if min_positive != 0.0 else 0.0)
    f2 = (jnp.clip((prop_pos - max_positive)
                   * (gain_factor / (1.0 - max_positive)), 0, max_factor)
          if max_positive != 1.0 else 0.0)
    return f1 - f2


@jax.custom_vjp
def _balancer_apply(x, scale_factor, sign_factor):
    return x


def _balancer_fwd(x, scale_factor, sign_factor):
    return x, (x > 0, scale_factor, sign_factor)


def _balancer_bwd(res, g):
    xgt0, scale_factor, sign_factor = res
    # factors arrive per-channel, already reshaped to broadcast against g
    # (the torch version unsqueezes trailing dims, scaling.py:63-72)
    factor = sign_factor + scale_factor * (xgt0.astype(g.dtype) - 0.5)
    neg_delta = jnp.abs(g) * factor
    return (g - neg_delta, jnp.zeros_like(scale_factor),
            jnp.zeros_like(sign_factor))


_balancer_apply.defvjp(_balancer_fwd, _balancer_bwd)


def activation_balancer(
    x: jnp.ndarray,
    channel_dim: int = -1,
    min_positive: float = 0.05,
    max_positive: float = 0.95,
    min_abs: float = 0.2,
    max_abs: float = 100.0,
    sign_gain_factor: float = 0.01,
    scale_gain_factor: float = 0.02,
    max_factor: float = 0.04,
    deterministic: bool = False,
) -> jnp.ndarray:
    """ActivationBalancer (scaling.py:644-743 core path, prob=1): identity
    whose backward pushes channel abs-means toward [min_abs, max_abs] and
    positive fractions toward [min_positive, max_positive]. ``deterministic``
    (inference) skips it entirely like the torch eval path."""
    if deterministic:
        return x
    if channel_dim < 0:
        channel_dim += x.ndim
    scale = jax.lax.stop_gradient(compute_scale_factor(
        x, channel_dim, min_abs, max_abs, scale_gain_factor, max_factor))
    if min_positive == 0.0 and max_positive == 1.0:
        sign = jnp.zeros_like(scale)
    else:
        sign = jax.lax.stop_gradient(compute_sign_factor(
            x, channel_dim, min_positive, max_positive, sign_gain_factor,
            max_factor))
    # reshape [C] -> broadcastable against x (factor applies on channel_dim)
    bshape = [1] * x.ndim
    bshape[channel_dim] = x.shape[channel_dim]
    return _balancer_apply(x, scale.reshape(bshape), sign.reshape(bshape))


def balanced_double_swish(x: jnp.ndarray, channel_dim: int = -1,
                          deterministic: bool = False) -> jnp.ndarray:
    """BalancedDoubleSwish (scaling.py:1230-1243): balancer then
    double_swish."""
    return double_swish(activation_balancer(x, channel_dim,
                                            deterministic=deterministic))


def balanced_basic_norm(x: jnp.ndarray, log_eps: jnp.ndarray,
                        channel_dim: int = -1,
                        deterministic: bool = False) -> jnp.ndarray:
    """BalancedBasicNorm (transformer.py:134-153): balancer (min_positive
    0.45, max_positive 0.55 per the reference defaults there) then
    BasicNorm."""
    x = activation_balancer(x, channel_dim, min_positive=0.45,
                            max_positive=0.55, deterministic=deterministic)
    return basic_norm(x, log_eps, channel_dim)


def scaled_init(init_fn, initial_scale: float):
    """ScaledLinear/ScaledConv semantics (scaling.py:556-641): the standard
    init scaled by ``initial_scale``."""
    def wrapped(*args, **kwargs):
        out = init_fn(*args, **kwargs)
        return jax.tree.map(lambda p: p * initial_scale, out)
    return wrapped
