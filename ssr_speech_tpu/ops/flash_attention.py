"""Fused (flash) attention for the SSR training forward + backward.

The reference hot loop materializes the full [B, H, S, S] score matrix
(``models/modules/activation.py:634`` -> torch baddbmm/softmax/bmm); on a
16 GB v5e that tensor is what forced FULL per-layer rematerialization of the
830M training step (41.5 GB of HLO temps at B=8/S=1280 — docs/DESIGN.md
"Training step"). This module computes the same attention in O(S) memory with
the tiled online-softmax Pallas kernels that ship in JAX
(``jax.experimental.pallas.ops.tpu.flash_attention``: fwd + custom-vjp bwd,
fp32 accumulation), so the remat policy can be dropped and the backward pass
stops recomputing every layer.

Mask semantics: the SSR joint-sequence mask (``ops/masking.py::xy_attn_bias``,
reference ``models/ssr.py:227-255``) reduces EXACTLY to

    attend(i, j)  =  (j <= i)  and  not key_pad(j)        [valid queries]

because the "text rows never see audio" block is implied by causality (every
audio column j >= sx is strictly future for every text row i < sx). That maps
onto the kernel's ``causal=True`` + segment ids: valid positions get segment 1
and padded positions segment 0, so valid queries attend exactly the un-padded
causal prefix. Padded QUERY rows attend (padded) keys of their own segment
instead of the valid prefix — finite garbage instead of the reference's
different garbage; those rows are sliced off / loss-masked downstream, and
keeping them finite avoids NaN rows poisoning dk/dv reductions in the
backward kernel.

``flash_attend_xy`` pads the sequence to a 128 multiple (kernel block size),
runs the kernel on TPU, and falls back to a jnp implementation with the SAME
segment+causal semantics elsewhere (CPU tests, head_dim < 128).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _supports_kernel(head_dim: int) -> bool:
    return (jax.default_backend() in ("tpu", "axon")
            and head_dim % 128 == 0)


def reference_attend(q, k, v, key_valid, sm_scale):
    """jnp fallback with identical mask semantics to the kernel path:
    causal AND same-segment (segment = valid/padded)."""
    s = q.shape[2]
    seg = key_valid.astype(jnp.int32)  # [B, S]
    same = seg[:, None, :] == seg[:, :, None]  # [B, Sq, Sk]
    idx = jnp.arange(s)
    causal = idx[None, :] <= idx[:, None]  # [Sq, Sk]
    ok = same & causal[None]
    bias = jnp.where(ok, 0.0, -1e9).astype(jnp.float32)[:, None, :, :]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * sm_scale + bias, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block"))
def _kernel_attend(q, k, v, seg, sm_scale: float, block: int = 512):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, h, s, dh = q.shape
    sp = _round_up(s, 128)
    if sp != s:
        pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        # padding extends segment 0 (= padded); kernel masks it for seg-1 rows
        seg = jnp.pad(seg, [(0, 0), (0, sp - s)])
    # the largest 128-multiple block that divides the padded length
    bq = next(c for c in (block, 256, 128) if c <= sp and sp % c == 0)
    bs = fa.BlockSizes(
        block_q=bq, block_k_major=bq, block_k=bq, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bq, block_k_dkv=bq,
        block_q_dkv=bq, block_k_major_dq=bq, block_k_dq=bq, block_q_dq=bq,
    )
    out = fa.flash_attention(
        q, k, v, segment_ids=fa.SegmentIds(q=seg, kv=seg),
        causal=True, sm_scale=sm_scale, block_sizes=bs)
    return out[:, :, :s, :]


def _pick_block(sp: int, req: int) -> int:
    """Largest block size <= `req` that divides the padded length `sp`.

    Splash/flash mask processing requires block_q | q_seq_len (ValueError
    otherwise); training buckets pad x/y to multiples of 32, so joint lengths
    that pad to ODD multiples of 128 (384, 640, 1152, ...) are routine and the
    256 default cannot be used verbatim. sp is always a 128 multiple here so
    the 128 fallback always divides."""
    return next(c for c in (req, 256, 128) if c <= sp and sp % c == 0)


@functools.partial(jax.jit, static_argnames=("sm_scale", "bq_req", "fused"))
def _splash_attend(q, k, v, seg, sm_scale: float, bq_req: int = 256,
                   fused: bool = True):
    """Splash-attention variant (`jax...tpu.splash_attention`): same causal
    + segment-id semantics as `_kernel_attend` via `CausalMask` and per-row
    segment ids, vmapped over batch (the kernel is per-example MHA).
    Splash takes no sm_scale — q is pre-scaled (bf16 rounding of q*scale,
    inside the paths' reassociation tolerance)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm_lib)

    b, h, s, dh = q.shape
    sp = _round_up(s, 128)
    if sp != s:
        pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        seg = jnp.pad(seg, [(0, 0), (0, sp - s)])
    mask = sm_lib.MultiHeadMask(
        [sm_lib.CausalMask((sp, sp)) for _ in range(h)])
    # 256-blocks + the fused dq/dkv backward kernel measured best at the
    # production geometry (B=8/H=16/S=1280/Dh=128): 584.9 -> 542.3 ms/step,
    # 46.1% MFU vs the flash_attention kernel — full-step interleaved A/B,
    # tools/train_breakdown_probe.py ab_attn. Splash's library defaults
    # (block_q 512 / block_kv 1024, unfused bwd) measured 36% WORSE than
    # flash there. SSR_SPLASH_BQ / SSR_SPLASH_FUSED override for probing
    # (read in flash_attend_xy so they reach the jit cache as static args).
    bq = _pick_block(sp, bq_req)
    if fused:
        bs = sk.BlockSizes(block_q=bq, block_kv=bq, block_q_dkv=bq,
                           block_kv_dkv=bq, use_fused_bwd_kernel=True)
    else:
        bs = sk.BlockSizes(block_q=bq, block_kv=bq, block_q_dkv=bq,
                           block_kv_dkv=bq, block_q_dq=bq, block_kv_dq=bq)
    kernel = sk.make_splash_mha(mask=mask, head_shards=1, q_seq_shards=1,
                                block_sizes=bs)
    q = (q * sm_scale).astype(q.dtype)
    out = jax.vmap(lambda qq, kk, vv, ss: kernel(
        qq, kk, vv, segment_ids=sk.SegmentIds(ss, ss)))(q, k, v, seg)
    return out[:, :, :s, :]


def flash_attend_xy(q, k, v, key_valid, *, sm_scale=None, block: int = 512,
                    mesh=None, spec=None, impl: str = "flash"):
    """Fused causal+padding attention over the [text ; audio] joint sequence.

    q/k/v: [B, H, S, Dh] (Q NOT pre-scaled); key_valid: [B, S] bool, True at
    real (un-padded) positions. Returns [B, H, S, Dh] in q's dtype. Valid
    rows match ``_attend``-with-``xy_attn_bias`` numerics to online-softmax
    reassociation tolerance; padded rows are finite garbage.

    mesh/spec: under SPMD training the Pallas custom call has no GSPMD
    partitioning rule, so XLA would all-gather its operands. ``spec`` is the
    q/k/v PartitionSpec (e.g. ``P('dp', 'tp', None, None)`` — batch on dp,
    heads on tp, both embarrassingly parallel for attention); the call is
    then wrapped in ``shard_map`` so each device runs the kernel on its local
    [B/dp, H/tp, S, Dh] shard with zero communication. The trainer passes
    these when it has a mesh (training/trainer.py).
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    seg = key_valid.astype(jnp.int32)
    import os as _os
    splash_bq = int(_os.environ.get("SSR_SPLASH_BQ", "256"))
    splash_fused = _os.environ.get("SSR_SPLASH_FUSED", "1") == "1"

    def _dispatch(q, k, v, seg):
        if _supports_kernel(q.shape[-1]):
            if impl == "splash":
                return _splash_attend(q, k, v, seg, sm_scale,
                                      bq_req=splash_bq, fused=splash_fused)
            return _kernel_attend(q, k, v, seg, sm_scale, block=block)
        return reference_attend(q, k, v, seg != 0, sm_scale)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        shard_map = jax.shard_map if hasattr(jax, "shard_map") else None
        if shard_map is None:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map
        seg_spec = P(spec[0], None)
        return shard_map(_dispatch, mesh=mesh, in_specs=(spec, spec, spec,
                                                         seg_spec),
                         out_specs=spec, check_vma=False)(q, k, v, seg)
    return _dispatch(q, k, v, seg)
