"""Blocked fused CE head: second head matmul + log-softmax + target NLL +
top-10 rank, without materializing fp32 logits in HBM.

The SSR training loss (reference ``models/ssr.py:354-371``) projects the
transformer output through K two-layer heads to ``[B, S, K, card]`` logits and
reduces them with a fp32 log-softmax CE plus a top-10 accuracy count. At the
830M operating point the fp32 conversion + logsumexp + take-along + rank
compare over the ``[B*S*4, 2056]`` logits are ~37 ms of VPU-bound
convert_reduce fusions per step (trace itemization, tools/train_trace_probe.py
— ROADMAP "Training MFU next steps"). This module fuses the SECOND head
matmul with all of those reductions in Pallas: each row block's logits live
only in VMEM (fp32, straight off the MXU accumulator), and only the O(N)
row statistics (nll, logz, top-10 hit) ever reach HBM.

Backward recomputes the logits tile-wise from the saved ``logz`` (the online
softmax trick: probs = exp(logits - logz)) in two kernels — one producing
dhidden with the full w2_k resident in VMEM, one vocab-tiled accumulating
dw2/db2 across row blocks — so the ``[N, card]`` softmax never hits HBM in
the backward either. The matmul is recomputed 3x total; at
``2*N*Hh*card ~ 86 GFLOP`` per pass that is sub-millisecond on the MXU and
far cheaper than the HBM/VPU traffic it replaces.

Numerics: logits accumulate in fp32 on the MXU (the unfused bf16-einsum path
rounds logits to bf16 before the fp32 softmax), so fused-vs-unfused losses
match to bf16 tolerance, not bit-exactly; the jnp fallback
(:func:`reference_ce_head`) implements the kernel's exact math for CPU tests.
Decode paths never use this op (fp32 ``predict_logits`` keeps goldens
bit-exact).

Layout note: O(N) per-row vectors (targets, nll, logz, hits, g) are carried
as ``[K, Nr, 1, R]`` so their Pallas blocks ``(1, 1, 1, R)`` satisfy the
TPU block-shape rule (last dim % 128 == 0, second-to-last == array dim).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU-only in this codebase; CPU tests use the jnp fallback
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None

_NEG = -1e9  # pad-column bias: exp underflows to 0, never exceeds a target
_R = 128  # row block (256 VMEM-OOMs the bwd dhidden kernel by 0.4 MB)
# dw2-kernel vocab tile: the largest of these dividing the padded vocab
# (2176 = 17*128 admits only 128; a non-dividing tile would silently skip
# the tail columns — the grid is cp // vt)
_VTS = (512, 256, 128)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _supports_kernel() -> bool:
    return pl is not None and jax.default_backend() in ("tpu", "axon")


def reference_ce_head(hidden, w2, b2, targets, top: int = 10):
    """jnp fallback with the kernel's exact math (fp32 matmul accumulation).

    hidden [K, N, Hh]; w2 [K, Hh, C]; b2 [K, C]; targets [K, N] int32.
    Returns (nll [K, N] f32, hits [K, N] f32 — 1.0 where rank < top).
    """
    logits = jnp.einsum("knh,khc->knc", hidden, w2,
                        preferred_element_type=jnp.float32)
    logits = logits + b2[:, None, :].astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    rank = jnp.sum((logits > tgt[..., None]).astype(jnp.float32), axis=-1)
    return logz - tgt, (rank < float(top)).astype(jnp.float32)


def _fwd_kernel(hid_ref, w2_ref, b2_ref, tgt_ref, nll_ref, logz_ref,
                hits_ref, *, top: int):
    logits = jax.lax.dot_general(
        hid_ref[0], w2_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0, 0].astype(jnp.float32)  # [R, Cp]
    r, cp = logits.shape
    m = jnp.max(logits, axis=-1, keepdims=True)
    s = jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)
    logz = (m + jnp.log(s))[:, 0]  # [R]
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, cp), 1)
    onehot = cols == tgt_ref[0, 0, 0][:, None]
    tgt = jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1)  # [R]
    rank = jnp.sum((logits > tgt[:, None]).astype(jnp.float32), axis=-1)
    nll_ref[0, 0, 0] = logz - tgt
    logz_ref[0, 0, 0] = logz
    hits_ref[0, 0, 0] = (rank < float(top)).astype(jnp.float32)


def _bwd_dhidden_kernel(hid_ref, w2_ref, b2_ref, tgt_ref, logz_ref, g_ref,
                        dhid_ref):
    hid = hid_ref[0]
    w2 = w2_ref[0]
    logits = jax.lax.dot_general(
        hid, w2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0, 0].astype(jnp.float32)
    r, cp = logits.shape
    probs = jnp.exp(logits - logz_ref[0, 0, 0][:, None])
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, cp), 1)
    onehot = (cols == tgt_ref[0, 0, 0][:, None]).astype(jnp.float32)
    dlogits = ((probs - onehot) * g_ref[0, 0, 0][:, None]).astype(hid.dtype)
    # dhidden = dlogits @ w2^T (cotangent cast to the operand dtype, as XLA
    # does for the bwd of a bf16 einsum)
    dhid_ref[0] = jax.lax.dot_general(
        dlogits, w2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dhid_ref.dtype)


def _bwd_dw2_kernel(hid_ref, w2t_ref, b2t_ref, tgt_ref, logz_ref, g_ref,
                    dw2_ref, db2_ref):
    """Grid (K, Vtiles, Rblocks) — r innermost so dw2/db2 blocks (indexed
    (k, v)) stay resident and accumulate across row blocks."""
    ri = pl.program_id(2)
    hid = hid_ref[0]  # [R, Hh]
    logits_t = jax.lax.dot_general(
        hid, w2t_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2t_ref[0, 0].astype(jnp.float32)  # [R, Vt]
    r, vt = logits_t.shape
    probs = jnp.exp(logits_t - logz_ref[0, 0, 0][:, None])
    vi = pl.program_id(1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, vt), 1) + vi * vt
    onehot = (cols == tgt_ref[0, 0, 0][:, None]).astype(jnp.float32)
    dlogits = ((probs - onehot) * g_ref[0, 0, 0][:, None]).astype(hid.dtype)
    dw2 = jax.lax.dot_general(  # [Hh, Vt]
        hid, dlogits, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2 = jnp.sum(dlogits.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(ri == 0)
    def _():
        dw2_ref[0] = dw2
        db2_ref[0] = db2

    @pl.when(ri != 0)
    def _():
        dw2_ref[0] += dw2
        db2_ref[0] += db2


def _rows(x):
    """[K, N] -> [K, Nr, 1, R] block layout (see module docstring)."""
    k, n = x.shape
    return x.reshape(k, n // _R, 1, _R)


def _row_spec():
    return pl.BlockSpec((1, 1, 1, _R), lambda ki, ri: (ki, ri, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("top",))
def _fused_fwd_padded(hidden, w2, b2, targets, top: int):
    k, n, hh = hidden.shape
    cp = w2.shape[-1]
    vmem = pltpu.VMEM
    row_shape = jax.ShapeDtypeStruct((k, n // _R, 1, _R), jnp.float32)
    nll, logz, hits = pl.pallas_call(
        functools.partial(_fwd_kernel, top=top),
        grid=(k, n // _R),
        in_specs=[
            pl.BlockSpec((1, _R, hh), lambda ki, ri: (ki, ri, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, hh, cp), lambda ki, ri: (ki, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 1, cp), lambda ki, ri: (ki, 0, 0),
                         memory_space=vmem),
            _row_spec(),
        ],
        out_specs=[_row_spec(), _row_spec(), _row_spec()],
        out_shape=[row_shape] * 3,
    )(hidden, w2, b2[:, None, :], _rows(targets))
    flat = lambda x: x.reshape(k, n)
    return flat(nll), flat(logz), flat(hits)


@jax.jit
def _fused_bwd_padded(hidden, w2, b2, targets, logz, g):
    k, n, hh = hidden.shape
    cp = w2.shape[-1]
    vt = next(c for c in _VTS if cp % c == 0)
    vmem = pltpu.VMEM
    b2r = b2[:, None, :]
    tr, zr, gr = _rows(targets), _rows(logz), _rows(g)
    dhid = pl.pallas_call(
        _bwd_dhidden_kernel,
        grid=(k, n // _R),
        in_specs=[
            pl.BlockSpec((1, _R, hh), lambda ki, ri: (ki, ri, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, hh, cp), lambda ki, ri: (ki, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 1, cp), lambda ki, ri: (ki, 0, 0),
                         memory_space=vmem),
            _row_spec(), _row_spec(), _row_spec(),
        ],
        out_specs=pl.BlockSpec((1, _R, hh), lambda ki, ri: (ki, ri, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((k, n, hh), hidden.dtype),
    )(hidden, w2, b2r, tr, zr, gr)
    rspec3 = pl.BlockSpec((1, 1, 1, _R), lambda ki, vi, ri: (ki, ri, 0, 0),
                          memory_space=vmem)
    dw2, db2 = pl.pallas_call(
        _bwd_dw2_kernel,
        grid=(k, cp // vt, n // _R),
        in_specs=[
            pl.BlockSpec((1, _R, hh), lambda ki, vi, ri: (ki, ri, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, hh, vt), lambda ki, vi, ri: (ki, 0, vi),
                         memory_space=vmem),
            pl.BlockSpec((1, 1, vt), lambda ki, vi, ri: (ki, 0, vi),
                         memory_space=vmem),
            rspec3, rspec3, rspec3,
        ],
        out_specs=[
            pl.BlockSpec((1, hh, vt), lambda ki, vi, ri: (ki, 0, vi),
                         memory_space=vmem),
            pl.BlockSpec((1, 1, vt), lambda ki, vi, ri: (ki, 0, vi),
                         memory_space=vmem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, hh, cp), jnp.float32),
            jax.ShapeDtypeStruct((k, 1, cp), jnp.float32),
        ],
    )(hidden, w2, b2r, tr, zr, gr)
    return dhid, dw2, db2[:, 0, :]


def _pad_inputs(hidden, w2, b2, targets):
    k, n, hh = hidden.shape
    c = w2.shape[-1]
    npad = _round_up(n, _R)
    cpad = _round_up(c, 128)
    if npad != n:
        hidden = jnp.pad(hidden, [(0, 0), (0, npad - n), (0, 0)])
        targets = jnp.pad(targets, [(0, 0), (0, npad - n)])
    if cpad != c:
        w2 = jnp.pad(w2, [(0, 0), (0, 0), (0, cpad - c)])
        b2 = jnp.pad(b2, [(0, 0), (0, cpad - c)], constant_values=_NEG)
    return hidden, w2, b2, targets


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_ce_head(hidden, w2, b2, targets, top: int = 10):
    """hidden [K, N, Hh] (bf16/f32), w2 [K, Hh, C], b2 [K, C],
    targets [K, N] int32 -> (nll [K, N] f32, hits [K, N] f32).

    TPU: Pallas kernels (fp32 logits never leave VMEM). Elsewhere: the jnp
    reference (identical math). ``hits`` (top-``top`` indicator) is treated
    as locally constant in the VJP (its a.e.-zero derivative).
    """
    return _fused_fwd(hidden, w2, b2, targets, top)[0]


def _fused_fwd(hidden, w2, b2, targets, top: int):
    n = hidden.shape[1]
    if not _supports_kernel():
        nll, hits = reference_ce_head(hidden, w2, b2, targets, top)
        return (nll, hits), (hidden, w2, b2, targets, None)
    hp, w2p, b2p, tp = _pad_inputs(hidden, w2, b2, targets)
    nll, logz, hits = _fused_fwd_padded(hp, w2p, b2p, tp, top)
    return ((nll[:, :n], hits[:, :n]),
            (hidden, w2, b2, targets, logz))


def _fused_bwd(top, res, cts):
    hidden, w2, b2, targets, logz = res
    g_nll, _ = cts  # hits: zero derivative a.e.
    if logz is None:  # jnp fallback: differentiate the reference directly
        def nll_only(h, w, b):
            return reference_ce_head(h, w, b, targets, top)[0]

        _, vjp = jax.vjp(nll_only, hidden, w2, b2)
        return (*vjp(g_nll), None)
    k, n, _ = hidden.shape
    hp, w2p, b2p, tp = _pad_inputs(hidden, w2, b2, targets)
    npad = hp.shape[1]
    gp = jnp.pad(g_nll.astype(jnp.float32), [(0, 0), (0, npad - n)])
    dhid, dw2, db2 = _fused_bwd_padded(hp, w2p, b2p, tp, logz, gp)
    c = w2.shape[-1]
    return (dhid[:, :n], dw2[..., :c].astype(w2.dtype),
            db2[..., :c].astype(b2.dtype), None)


fused_ce_head.defvjp(_fused_fwd, _fused_bwd)
