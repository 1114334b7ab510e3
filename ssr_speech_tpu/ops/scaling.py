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
    init times ``initial_scale`` (scaling.py:556-641),
  - :func:`whiten` / :func:`whitening_metric` — the Whiten gradient penalty
    (scaling.py:808-971),
  - :func:`max_eig` / :func:`init_max_eig_direction` — the MaxEig dominant-
    eigendirection limiter with explicit power-method state
    (scaling.py:325-364, 1007-1159),
  - :func:`with_loss` — attach an auxiliary loss to a passthrough
    (scaling.py:973-991).

All pure functions; the balancer's gradient surgery uses ``jax.custom_vjp``.
"""

from __future__ import annotations

import functools
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


# ---------------------------------------------------------------------------
# Whitening penalty (reference scaling.py:808-971): identity forward whose
# backward adds a gradient pushing the per-group feature covariance toward a
# scalar multiple of I.  The torch module gates application on
# ``random.random() > prob`` host-side; our functional form is always-on (the
# caller decides when to call it, e.g. via a dropout-style rng outside jit) —
# same convention as :func:`activation_balancer`.
# ---------------------------------------------------------------------------


def whitening_metric(x: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """_whitening_metric (scaling.py:808-844): 1.0 iff every group's centered
    covariance is the same multiple of the identity; larger otherwise."""
    x = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    num_frames, num_channels = x.shape
    assert num_channels % num_groups == 0
    cpg = num_channels // num_groups
    x = jnp.transpose(x.reshape(num_frames, num_groups, cpg), (1, 0, 2))
    x = x - jnp.mean(x, axis=1, keepdims=True)
    x_covar = jnp.matmul(jnp.transpose(x, (0, 2, 1)), x)
    diag = jnp.diagonal(x_covar, axis1=-2, axis2=-1)
    x_covar_mean_diag = jnp.mean(diag)
    x_covarsq_mean_diag = jnp.sum(x_covar * x_covar) / (num_groups * cpg)
    return x_covarsq_mean_diag / (x_covar_mean_diag ** 2 + 1.0e-20)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def whiten(x: jnp.ndarray, num_groups: int = 1,
           whitening_limit: float = 2.0,
           grad_scale: float = 0.01) -> jnp.ndarray:
    """Whiten (scaling.py:887-971): forward identity; backward adds
    ``grad(relu(metric - limit))`` rescaled to ``grad_scale`` times the
    incoming gradient norm.  Inactive (exact passthrough) while the metric is
    under ``whitening_limit``."""
    return x


def _whiten_fwd(x, num_groups, whitening_limit, grad_scale):
    return x, (x,)


def _whiten_bwd(num_groups, whitening_limit, grad_scale, res, g):
    (x,) = res
    xf = jax.lax.stop_gradient(x).astype(jnp.float32)
    penalty = jax.grad(
        lambda v: jax.nn.relu(whitening_metric(v, num_groups)
                              - whitening_limit))(xf)
    gf = g.astype(jnp.float32)
    g_norm = jnp.sqrt(jnp.sum(gf * gf))
    p_norm = jnp.sqrt(jnp.sum(penalty * penalty))
    scale = grad_scale * (g_norm / (p_norm + 1.0e-20))
    return ((g + (penalty * scale).astype(g.dtype)),)


whiten.defvjp(_whiten_fwd, _whiten_bwd)


# ---------------------------------------------------------------------------
# MaxEig (reference scaling.py:325-364, 1007-1159): power-method estimate of
# the dominant eigen-direction of the centered feature covariance; when that
# direction explains >= max_var_per_eig of the variance, the backward mixes in
# a gradient that shrinks it.  Torch keeps the direction estimate and a
# cur_prob scalar as module buffers; our state is explicit — the caller
# threads ``direction`` through (init with :func:`init_max_eig_direction`) and
# may implement the reference's cur_prob thinning host-side.  The active/
# inactive branch is a traced gate so the op jits.
# ---------------------------------------------------------------------------


def init_max_eig_direction(num_channels: int) -> jnp.ndarray:
    """MaxEig.__init__ buffer (scaling.py:1050-1055): normalized arange."""
    d = jnp.arange(num_channels, dtype=jnp.float32)
    return d / jnp.linalg.norm(d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _max_eig_apply(x, coeffs, direction, gate, channel_dim, grad_scale):
    return x


def _max_eig_apply_fwd(x, coeffs, direction, gate, channel_dim, grad_scale):
    return x, (x, coeffs, direction, gate)


def _max_eig_apply_bwd(channel_dim, grad_scale, res, g):
    x, coeffs, direction, gate = res
    num_channels = x.shape[channel_dim]

    def variance_proportion(x_orig):
        # MaxEigLimiterFunction.backward (scaling.py:340-364): recompute the
        # centered features WITH gradient flow; coeffs/direction are detached.
        xm = jnp.swapaxes(x_orig, channel_dim, -1).reshape(-1, num_channels)
        xm = xm - jnp.mean(xm, axis=0)
        x_var = jnp.mean(xm ** 2)
        resid = xm - coeffs * direction
        return (x_var - jnp.mean(resid ** 2)) / (x_var + 1.0e-20)

    pg = jax.grad(variance_proportion)(
        jax.lax.stop_gradient(x).astype(jnp.float32))
    gf = g.astype(jnp.float32)
    g_norm = jnp.sqrt(jnp.sum(gf * gf))
    p_norm = jnp.sqrt(jnp.sum(pg * pg))
    extra = pg * grad_scale * g_norm / (p_norm + 1.0e-20)
    return (g + (gate * extra).astype(g.dtype), jnp.zeros_like(coeffs),
            jnp.zeros_like(direction), jnp.zeros_like(gate))


_max_eig_apply.defvjp(_max_eig_apply_fwd, _max_eig_apply_bwd)


def max_eig(x: jnp.ndarray, direction: jnp.ndarray, channel_dim: int = -1,
            max_var_per_eig: float = 0.2, grad_scale: float = 0.01
            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One MaxEig.forward step (scaling.py:1057-1115).  Returns
    ``(x_out, new_direction, variance_proportion)``: ``x_out`` is ``x`` with
    the gradient surgery attached (active iff the proportion crosses
    ``max_var_per_eig``), ``new_direction`` is the updated power-method state
    (normalize(0.1*prev + step), falling back to ``direction`` on non-finite),
    and the proportion is returned so callers can drive the reference's
    cur_prob schedule (scaling.py:1100-1113) host-side if desired."""
    if channel_dim < 0:
        channel_dim += x.ndim
    num_channels = x.shape[channel_dim]
    xf = jax.lax.stop_gradient(x).astype(jnp.float32)
    xm = jnp.swapaxes(xf, channel_dim, -1).reshape(-1, num_channels)
    xm = xm - jnp.mean(xm, axis=0)
    # _find_direction_coeffs (scaling.py:1131-1159)
    coeffs = jnp.sum(xm * direction, axis=1, keepdims=True) + 1.0e-10
    cur_dir = (jnp.sum(xm * coeffs, axis=0)
               / (jnp.sum(coeffs ** 2) + 1.0e-20))
    x_var = jnp.mean(xm ** 2)
    resid = xm - coeffs * cur_dir
    vp = (x_var - jnp.mean(resid ** 2)) / (x_var + 1.0e-20)
    # _set_direction (scaling.py:1117-1129), with the non-finite guard
    mixed = 0.1 * direction + cur_dir
    mixed = mixed / jnp.linalg.norm(mixed)
    new_direction = jnp.where(jnp.isfinite(jnp.sum(mixed)), mixed, direction)
    gate = (vp >= max_var_per_eig).astype(jnp.float32)
    y = _max_eig_apply(x, coeffs, cur_dir, gate, channel_dim, grad_scale)
    return y, new_direction, vp


@jax.custom_vjp
def with_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """WithLoss (scaling.py:973-991): returns ``x`` but adds ``y.sum()`` to
    whatever loss the output feeds (backward sends ones into ``y``)."""
    return x


def _with_loss_fwd(x, y):
    return x, jnp.zeros_like(y)


def _with_loss_bwd(res, g):
    return g, jnp.ones_like(res)


with_loss.defvjp(_with_loss_fwd, _with_loss_bwd)
