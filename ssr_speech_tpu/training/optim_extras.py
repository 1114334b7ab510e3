"""Optim extras from the audiocraft registry: D-Adaptation Adam and the
cosine / inverse-sqrt / polynomial-decay LR schedules.

Capability parity (reference ``audiocraft/audiocraft/optim/``):
  - ``DAdaptAdam`` (dadam.py:30-252): Adam whose step size ``d`` is learned
    online — per step it accumulates three whole-model scalars
    (``g_sq = Σ g²/denom``, ``sksq_weighted = Σ s²/denom``,
    ``sk_l1 = Σ|s|``), updates
    ``d ← max(d, min((sksq_weighted/(1-β2) - gsq_weighted)/sk_l1,
    d·growth))``, and applies ``p ← p - exp_avg/denom`` with decoupled weight
    decay. In JAX the cross-tensor sums are plain ``jnp`` reductions; under a
    dp mesh XLA inserts the all-reduce (replacing the fsdp_in_use
    dist.all_reduce branch, dadam.py:196-206).
  - ``CosineLRScheduler`` (cosine_lr_scheduler.py:13-48),
    ``InverseSquareRootLRScheduler`` (inverse_sqrt_lr_scheduler.py:10-40),
    ``PolynomialDecayLRScheduler`` (polynomial_decay_lr_scheduler.py:10-49):
    the same closed forms as step->lr functions usable with any optax
    optimizer and the solver registry (builders.py:117-160).
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

# ------------------------------------------------------------------ schedules


def cosine_schedule(base_lr: float, total_steps: int, warmup_steps: int,
                    lr_min_ratio: float = 0.0, cycle_length: float = 1.0
                    ) -> Callable:
    """reference cosine_lr_scheduler.py:34-45."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.where(warmup_steps > 0, step / max(warmup_steps, 1), 1.0)
        s = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
        ratio = lr_min_ratio + 0.5 * (1 - lr_min_ratio) * (
            1.0 + jnp.cos(jnp.pi * s / cycle_length))
        lr = jnp.where(step < warmup_steps, warm,
                       jnp.where(step <= total_steps, ratio, lr_min_ratio))
        return base_lr * lr

    return schedule


def inverse_sqrt_schedule(base_lr: float, warmup_steps: int,
                          warmup_init_lr: float = 0.0) -> Callable:
    """reference inverse_sqrt_lr_scheduler.py:28-36."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr_step = (base_lr - warmup_init_lr) / max(warmup_steps, 1)
        warm = warmup_init_lr + step * lr_step
        decay = base_lr * (warmup_steps ** 0.5) * jnp.maximum(step, 1.0) ** -0.5
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule


def polynomial_decay_schedule(base_lr: float, total_steps: int,
                              warmup_steps: int, end_lr: float = 0.0,
                              zero_lr_warmup_steps: int = 0,
                              power: float = 1.0) -> Callable:
    """reference polynomial_decay_lr_scheduler.py:31-46."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        total_warm = warmup_steps + zero_lr_warmup_steps
        warm_ratio = (step - zero_lr_warmup_steps) / max(warmup_steps, 1)
        pct_remaining = 1.0 - (step - total_warm) / max(total_steps - total_warm, 1)
        poly = (base_lr - end_lr) * pct_remaining ** power + end_lr
        lr = jnp.where(
            (zero_lr_warmup_steps > 0) & (step <= zero_lr_warmup_steps), 0.0,
            jnp.where((warmup_steps > 0) & (step <= total_warm),
                      warm_ratio * base_lr,
                      jnp.where(step >= total_steps, end_lr, poly)))
        return lr

    return schedule


# --------------------------------------------------------------- DAdaptAdam


class _DAdaptLeaf(NamedTuple):
    exp_avg: jnp.ndarray
    exp_avg_sq: jnp.ndarray
    s: jnp.ndarray


class DAdaptAdamState(NamedTuple):
    leaves: Any
    d: jnp.ndarray
    gsq_weighted: jnp.ndarray
    step: jnp.ndarray


def dadapt_adam(lr: float = 1.0, betas: Tuple[float, float] = (0.9, 0.999),
                eps: float = 1e-8, weight_decay: float = 0.0,
                d0: float = 1e-6, growth_rate: float = math.inf
                ) -> optax.GradientTransformation:
    """D-Adaptation Adam (decoupled weight decay), step-for-step with the
    reference (dadam.py:107-252). Leave ``lr`` at 1.0 unless unstable."""
    beta1, beta2 = betas

    def init(params):
        leaves = jax.tree.map(
            lambda p: _DAdaptLeaf(jnp.zeros_like(p), jnp.zeros_like(p),
                                  jnp.zeros_like(p)), params)
        return DAdaptAdamState(leaves, jnp.asarray(d0, jnp.float32),
                               jnp.zeros((), jnp.float32),
                               jnp.zeros((), jnp.int32))

    def update(grads, state: DAdaptAdamState, params=None):
        assert params is not None, "dadapt_adam needs params"
        dlr = state.d * lr

        g_leaves, treedef = jax.tree.flatten(grads)
        p_leaves = treedef.flatten_up_to(params)
        old_leaves = treedef.flatten_up_to(state.leaves)

        def ema(g, leaf: _DAdaptLeaf):
            exp_avg = beta1 * leaf.exp_avg + dlr * (1 - beta1) * g
            exp_avg_sq = beta2 * leaf.exp_avg_sq + (1 - beta2) * g * g
            s = beta2 * leaf.s + dlr * (1 - beta2) * g
            return _DAdaptLeaf(exp_avg, exp_avg_sq, s)

        new_leaves = [ema(g, leaf) for g, leaf in zip(g_leaves, old_leaves)]

        g_sq = sksq_weighted = sk_l1 = jnp.zeros((), jnp.float32)
        for g, leaf in zip(g_leaves, new_leaves):
            denom = jnp.sqrt(leaf.exp_avg_sq) + eps
            g_sq += jnp.sum(g * g / denom)
            sksq_weighted += jnp.sum(leaf.s ** 2 / denom)
            sk_l1 += jnp.sum(jnp.abs(leaf.s))

        gsq_weighted = beta2 * state.gsq_weighted + g_sq * dlr ** 2 * (1 - beta2)
        d_hat = (sksq_weighted / (1 - beta2) - gsq_weighted) / jnp.maximum(
            sk_l1, 1e-30)
        growth = state.d * growth_rate if math.isfinite(growth_rate) else jnp.inf
        new_d = jnp.maximum(state.d, jnp.minimum(d_hat, growth))
        # reference: d frozen (and no update at all) until any grad flows
        new_d = jnp.where(sk_l1 == 0, state.d, new_d)
        gsq_weighted = jnp.where(sk_l1 == 0, state.gsq_weighted, gsq_weighted)

        def delta(p, leaf: _DAdaptLeaf):
            denom = jnp.sqrt(leaf.exp_avg_sq) + eps
            upd = -leaf.exp_avg / denom
            if weight_decay:
                upd = upd - weight_decay * dlr * p  # decoupled (dadam.py:244-245)
            return upd

        updates = treedef.unflatten(
            [delta(p, leaf) for p, leaf in zip(p_leaves, new_leaves)])
        return updates, DAdaptAdamState(treedef.unflatten(new_leaves), new_d,
                                        gsq_weighted, state.step + 1)

    return optax.GradientTransformation(init, update)
