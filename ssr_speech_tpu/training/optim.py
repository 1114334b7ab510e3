"""Optimizers and LR schedules: ScaledAdam + Eden (icefall lineage) in optax,
plus the AdamW + linear-warmup default.

Parity targets (reference ``steps/optim.py``):
  - Eden schedule (optim.py:759-808):
      lr = base * ((step^2+B^2)/B^2)^-0.25 * ((epoch^2+E^2)/E^2)^-0.25 * warmup
    with warmup linear 0.5 -> 1 over ``warmup_batches`` and pseudo-epochs
    ``epoch = step // pseudo_epoch_size + 1`` (steps/trainer.py:72-73).
  - ScaledAdam (optim.py:129-661): Adam-like update scaled by each tensor's
    parameter RMS, a separately-learned log-scale per tensor (the "size
    update", optim.py:531-597), scalar parameters handled like plain Adam
    with clamping (optim.py:636-661), and median-based whole-model gradient
    clipping on RMS-normalized gradients (optim.py:316-412).

The torch version batches same-shaped tensors for speed; in JAX each leaf is
already a fused XLA op, so state is kept per-leaf. Reductions for the
clipping norm are plain ``jnp`` sums which XLA fuses and, under pjit,
all-reduces across the data-parallel mesh automatically.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import OptimConfig


# ------------------------------------------------------------------ schedules

def eden_schedule(
    base_lr: float,
    lr_batches: float,
    lr_epochs: float,
    warmup_batches: float,
    pseudo_epoch_size: int,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Eden LR (reference optim.py:795-808 + trainer.py:72-73 epoch wiring)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / pseudo_epoch_size) + 1.0
        f_b = ((step ** 2 + lr_batches ** 2) / lr_batches ** 2) ** -0.25
        f_e = ((epoch ** 2 + lr_epochs ** 2) / lr_epochs ** 2) ** -0.25
        warm = jnp.where(
            step >= warmup_batches, 1.0, 0.5 + 0.5 * step / jnp.maximum(warmup_batches, 1.0)
        )
        return base_lr * f_b * f_e * warm

    return schedule


def linear_warmup_schedule(base_lr: float, total_steps: int, warmup_fraction: float):
    """AdamW default schedule of the reference trainer (steps/trainer.py:439-449):
    linear warmup then linear decay to 0."""
    warm = max(int(total_steps * warmup_fraction), 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        up = step / warm
        down = jnp.maximum(0.0, (total_steps - step) / jnp.maximum(total_steps - warm, 1))
        return base_lr * jnp.where(step < warm, up, down)

    return schedule


# ----------------------------------------------------------------- ScaledAdam

class _LeafState(NamedTuple):
    delta: jnp.ndarray
    exp_avg_sq: jnp.ndarray
    param_rms: jnp.ndarray  # broadcast shape; zeros-like scalar for scalars
    scale_grads: jnp.ndarray  # [size_update_period, ...broadcast]
    scale_exp_avg_sq: jnp.ndarray


class _LeafOut(NamedTuple):
    update: jnp.ndarray
    state: _LeafState


class ScaledAdamState(NamedTuple):
    step: jnp.ndarray
    leaves: Any  # pytree of _LeafState
    norm_buffer: jnp.ndarray  # [clipping_update_period] recent grad norms
    norm_threshold: jnp.ndarray  # scalar; +inf until first boundary


def _is_scalar(p) -> bool:
    return p.size == 1


def scaled_adam(
    schedule: Callable,
    cfg: OptimConfig,
) -> optax.GradientTransformation:
    """ScaledAdam as an optax transformation. ``update`` requires params.

    ``cfg.moments_dtype="bfloat16"`` stores the two param-sized state
    buffers (``delta`` momentum and ``exp_avg_sq``) in bf16 — 3.3 GB saved
    at 830M, admitting a larger per-chip batch — while all arithmetic stays
    fp32 (cast on read, round on store). Default fp32 matches the torch
    reference (optim.py ScaledAdam) bit-for-step."""
    beta1, beta2 = cfg.betas
    P = cfg.size_update_period
    CUP = cfg.clipping_update_period
    mdt = jnp.bfloat16 if cfg.moments_dtype == "bfloat16" else None

    def init(params):
        def leaf(p):
            p = jnp.asarray(p)
            bshape = (1,) * p.ndim
            return _LeafState(
                delta=jnp.zeros(p.shape, mdt or p.dtype),
                exp_avg_sq=jnp.zeros(p.shape, mdt or p.dtype),
                param_rms=(
                    jnp.sqrt(jnp.mean(p.astype(jnp.float32) ** 2, keepdims=True).reshape(bshape))
                    if not _is_scalar(p) else jnp.zeros(bshape, jnp.float32)
                ),
                scale_grads=jnp.zeros((P,) + bshape, jnp.float32),
                scale_exp_avg_sq=jnp.zeros(bshape, jnp.float32),
            )

        return ScaledAdamState(
            step=jnp.zeros((), jnp.int32),
            leaves=jax.tree.map(leaf, params),
            norm_buffer=jnp.zeros((CUP,), jnp.float32),
            norm_threshold=jnp.asarray(jnp.inf, jnp.float32),
        )

    def update(grads, state: ScaledAdamState, params=None):
        assert params is not None, "ScaledAdam needs params"
        step = state.step
        lr = schedule(step)

        # ---- median-based global clipping (reference optim.py:316-412) ----
        if cfg.clipping_scale is not None:
            def leaf_sumsq(g, s, p):
                g = g.astype(jnp.float32)
                if _is_scalar(p):
                    return jnp.sum(g ** 2)
                return jnp.sum((g * s.param_rms) ** 2)

            sumsqs = jax.tree.map(leaf_sumsq, grads, state.leaves, params)
            tot_norm = jnp.sqrt(sum(jax.tree.leaves(sumsqs)))
            norm_buffer = state.norm_buffer.at[step % CUP].set(tot_norm)
            # at each period boundary (step % CUP == 0, step > 0), refresh the
            # threshold to clipping_scale * median of the recent norms
            sorted_norms = jnp.sort(norm_buffer)
            median = sorted_norms[(CUP // 4) * 2]
            at_boundary = (step % CUP == 0) & (step > 0)
            norm_threshold = jnp.where(
                at_boundary, cfg.clipping_scale * median, state.norm_threshold
            )
            clip = jnp.where(
                (step >= CUP) & jnp.isfinite(norm_threshold),
                jnp.minimum(1.0, norm_threshold / (tot_norm + 1e-20)),
                1.0,
            )
            # step 0: other state not initialized yet -> no clipping
            clip = jnp.where(step == 0, 1.0, clip)
        else:
            clip = jnp.asarray(1.0, jnp.float32)
            norm_buffer = state.norm_buffer
            norm_threshold = state.norm_threshold

        size_lr = lr * cfg.scalar_lr_scale

        def leaf_update(g, s: _LeafState, p):
            g = g.astype(jnp.float32) * clip
            pf = p.astype(jnp.float32)
            sdt = s.delta.dtype  # storage dtype (fp32 or bf16 moments)
            delta = s.delta.astype(jnp.float32) * beta1
            s_eas = s.exp_avg_sq.astype(jnp.float32)
            if _is_scalar(p):
                # plain Adam with clamping (reference optim.py:636-661)
                eas = s_eas * beta2 + (1 - beta2) * g * g
                bc2 = 1 - beta2 ** (step.astype(jnp.float32) + 1)
                denom = jnp.sqrt(eas / bc2) + cfg.eps
                delta = delta - size_lr * (1 - beta1) * g / denom
                new_p = jnp.clip(pf, -cfg.scalar_max, cfg.scalar_max) + delta
                return _LeafOut((new_p - pf).astype(p.dtype),
                                _LeafState(delta.astype(sdt),
                                           eas.astype(sdt), s.param_rms,
                                           s.scale_grads, s.scale_exp_avg_sq))

            # ---- learned-size update every P steps (optim.py:504-597) ----
            red_axes = tuple(range(p.ndim))
            this_scale_grad = jnp.sum(pf * g, axis=red_axes, keepdims=True)
            scale_grads = s.scale_grads.at[step % P].set(this_scale_grad)
            at_size_step = (step % P) == (P - 1)
            new_rms = jnp.sqrt(jnp.mean(pf ** 2, keepdims=True))
            param_rms = jnp.where(at_size_step, new_rms, s.param_rms)

            beta2c = beta2 ** P
            sesq_new = s.scale_exp_avg_sq * beta2c + (1 - beta2c) * jnp.mean(
                scale_grads ** 2, axis=0
            )
            sesq = jnp.where(at_size_step, sesq_new, s.scale_exp_avg_sq)
            size_step_n = ((step.astype(jnp.float32) + 1) // P)
            bc2s = 1 - beta2c ** size_step_n
            denom_s = jnp.sqrt(sesq) + cfg.eps
            scale_step = -size_lr * jnp.sqrt(jnp.maximum(bc2s, 0.0)) * jnp.sum(
                scale_grads, axis=0
            ) / denom_s
            scale_step = jnp.where(param_rms < cfg.param_min_rms, 0.0, scale_step)
            scale_step = jnp.where(
                param_rms > cfg.param_max_rms, -size_lr * P, scale_step
            )
            do_size = at_size_step & (step > 0)
            delta = delta + jnp.where(do_size, (1 - beta1) * pf * scale_step, 0.0)

            # ---- main RMS-scaled Adam step (optim.py:602-634) ----
            eas = s_eas * beta2 + (1 - beta2) * g * g
            bc2 = 1 - beta2 ** (step.astype(jnp.float32) + 1)
            eas_used = jnp.where(bc2 < 0.99, eas / jnp.maximum(bc2, 1e-8), eas)
            denom = jnp.sqrt(eas_used) + cfg.eps
            alpha = -lr * (1 - beta1) * jnp.maximum(param_rms, cfg.param_min_rms)
            delta = delta + (g / denom) * alpha
            return _LeafOut(delta.astype(p.dtype),
                            _LeafState(delta.astype(sdt), eas.astype(sdt),
                                       param_rms, scale_grads, sesq))

        out = jax.tree.map(
            leaf_update, grads, state.leaves, params,
            is_leaf=lambda x: isinstance(x, _LeafState),
        )
        is_out = lambda x: isinstance(x, _LeafOut)
        updates = jax.tree.map(lambda o: o.update, out, is_leaf=is_out)
        leaves = jax.tree.map(lambda o: o.state, out, is_leaf=is_out)
        new_state = ScaledAdamState(
            step=step + 1, leaves=leaves,
            norm_buffer=norm_buffer, norm_threshold=norm_threshold,
        )
        return updates, new_state

    return optax.GradientTransformation(init, update)


# ----------------------------------------------------------------------- Eve

class _EveLeaf(NamedTuple):
    exp_avg: jnp.ndarray
    exp_avg_sq: jnp.ndarray


class EveState(NamedTuple):
    step: jnp.ndarray
    leaves: Any


def eve(schedule: Callable, betas=(0.9, 0.98), eps: float = 1e-8,
        weight_decay: float = 1e-3, target_rms: float = 0.1
        ) -> optax.GradientTransformation:
    """Eve optimizer (reference steps/optim.py:836-983): AdamW whose weight
    decay only applies while a tensor's RMS exceeds ``target_rms``; scalars
    are never decayed. Kept for parity with 'scaled' icefall modules."""
    beta1, beta2 = betas

    def init(params):
        leaves = jax.tree.map(
            lambda p: _EveLeaf(jnp.zeros_like(p), jnp.zeros_like(p)), params
        )
        return EveState(jnp.zeros((), jnp.int32), leaves)

    def update(grads, state: EveState, params=None):
        assert params is not None
        step = state.step + 1
        lr = schedule(state.step)
        bc1 = 1 - beta1 ** step.astype(jnp.float32)
        bc2 = 1 - beta2 ** step.astype(jnp.float32)

        def leaf(g, s: _EveLeaf, p):
            g = g.astype(jnp.float32)
            pf = p.astype(jnp.float32)
            exp_avg = s.exp_avg * beta1 + (1 - beta1) * g
            exp_avg_sq = s.exp_avg_sq * beta2 + (1 - beta2) * g * g
            denom = jnp.sqrt(exp_avg_sq) * (bc2 ** -0.5) + eps
            step_size = lr / bc1
            new_p = pf
            if p.size > 1:
                above = jnp.linalg.norm(pf) > target_rms * (p.size ** 0.5)
                new_p = new_p * (1 - weight_decay * above)
            new_p = new_p - step_size * exp_avg / denom
            return _LeafOut((new_p - pf).astype(p.dtype),
                            _EveLeaf(exp_avg, exp_avg_sq))

        out = jax.tree.map(leaf, grads, state.leaves, params,
                           is_leaf=lambda x: isinstance(x, _EveLeaf))
        is_out = lambda x: isinstance(x, _LeafOut)
        updates = jax.tree.map(lambda o: o.update, out, is_leaf=is_out)
        leaves = jax.tree.map(lambda o: o.state, out, is_leaf=is_out)
        return updates, EveState(step, leaves)

    return optax.GradientTransformation(init, update)


# --------------------------------------------------------------------- AdamW

def adamw(schedule: Callable, cfg: OptimConfig) -> optax.GradientTransformation:
    """Reference default: AdamW(betas=(.9,.999)-ish, wd) + grad clipping
    (steps/trainer.py:424-449, config.py:20-25)."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_val),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=cfg.weight_decay),
    )


def build_optimizer(cfg: OptimConfig, total_steps: int = 100000):
    """Factory mirroring reference ``_setup_optimizer`` (steps/trainer.py:424-463)."""
    name = cfg.optimizer_name.lower()
    if name == "scaledadam":
        sched = eden_schedule(cfg.lr, cfg.reduce_lr_start_step,
                              cfg.reduce_lr_start_epoch, cfg.warmup_batches,
                              cfg.pseudo_epoch_size)
        return scaled_adam(sched, cfg), sched
    if name == "adamw":
        sched = linear_warmup_schedule(cfg.lr, total_steps, cfg.warmup_fraction)
        return adamw(sched, cfg), sched
    if name == "eve":
        sched = linear_warmup_schedule(cfg.lr, total_steps, cfg.warmup_fraction)
        return eve(sched, betas=cfg.betas, eps=cfg.eps,
                   weight_decay=cfg.weight_decay), sched
    raise ValueError(cfg.optimizer_name)
