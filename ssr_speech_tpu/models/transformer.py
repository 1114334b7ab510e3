"""Functional pre-norm transformer with stacked-layer scan and a ring KV cache.

Re-designs the reference decoder stack (``models/modules/transformer.py:179-489``
TransformerEncoderLayer/TransformerEncoder reused as a self-attention-only
decoder, and the KV-cache threading of ``models/modules/activation.py:626-634``)
as pure JAX:

  - all L layers' parameters are stacked on a leading axis and executed with a
    single ``lax.scan`` (one compiled layer body instead of L unrolled ones);
  - the KV cache is a preallocated ``[L, B, H, Tmax, Dh]`` buffer updated with
    ``dynamic_update_slice`` — no concatenation, no reallocation, so the whole
    AR decode loop stays inside one XLA while-loop;
  - attention is computed with plain einsum/softmax which XLA fuses and maps
    onto the MXU; no torch SDPA needed.

Math parity targets: LayerNorm eps 1e-5 (``transformer.py:18-80``), packed QKV
projection (``activation.py:233``), ReLU feed-forward d_model*4
(``models/ssr.py:160-168``), final LayerNorm after the stack
(``models/ssr.py:169-173``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from ..config import SSRModelConfig

Params = Dict[str, Any]

# rematerialization policy for the training layer scan (see
# transformer_forward); module-level so probes/configs can override
REMAT_POLICY = None


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _linear_init(key, fan_in, shape_w, shape_b, dtype=jnp.float32):
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return _uniform(kw, shape_w, bound, dtype), _uniform(kb, shape_b, bound, dtype)


def init_transformer(key: jax.Array, cfg: SSRModelConfig) -> Params:
    """Stacked parameters for L identical pre-norm layers + final norm."""
    d, f, L = cfg.d_model, cfg.ffn_dim, cfg.num_layers
    keys = jax.random.split(key, L)

    def one_layer(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        # torch MultiheadAttention uses xavier_uniform for in_proj
        # (activation.py in_proj_weight) and Linear default for out_proj.
        limit = math.sqrt(6.0 / (d + 3 * d))
        qkv_w = jax.random.uniform(k1, (d, 3 * d), jnp.float32, -limit, limit)
        qkv_b = jnp.zeros((3 * d,), jnp.float32)
        out_w, out_b = _linear_init(k2, d, (d, d), (d,))
        ffn1_w, ffn1_b = _linear_init(k3, d, (d, f), (f,))
        ffn2_w, ffn2_b = _linear_init(k4, f, (f, d), (d,))
        return dict(
            ln1_w=jnp.ones((d,)), ln1_b=jnp.zeros((d,)),
            qkv_w=qkv_w, qkv_b=qkv_b, out_w=out_w, out_b=out_b,
            ln2_w=jnp.ones((d,)), ln2_b=jnp.zeros((d,)),
            ffn1_w=ffn1_w, ffn1_b=ffn1_b, ffn2_w=ffn2_w, ffn2_b=ffn2_b,
        )

    layers = [one_layer(k) for k in keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)
    return dict(layers=stacked, final_ln_w=jnp.ones((d,)), final_ln_b=jnp.zeros((d,)))


def layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * w + b).astype(x.dtype)


def _dropout(x, rate, key, deterministic):
    """Inverted dropout via ``jax.random.bernoulli``. An 8-bit-mask variant
    (one random byte per element instead of a full f32 uniform) looked like a
    win on the isolated forward probe but made the FULL 830M train step ~5%
    SLOWER (703 -> 741 ms interleaved min-of-groups A/B) — uint8 compares
    defeat fusion XLA finds for the f32 path under remat; see
    docs/DESIGN.md "8-bit dropout masks"."""
    if deterministic or rate == 0.0:
        return x
    # the checkpoint_name lets the "dots_masks" remat policy save the bool
    # mask (1 byte/elem) so the backward neither regenerates the RNG nor
    # recomputes the bernoulli compare (see transformer_forward remat modes)
    keep = _checkpoint_name(
        jax.random.bernoulli(key, 1.0 - rate, x.shape), "drop_mask")
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _split_heads(x: jnp.ndarray, nhead: int) -> jnp.ndarray:
    b, s, d = x.shape
    return x.reshape(b, s, nhead, d // nhead).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


def _attend(q, k, v, bias):
    """q [B,H,Tq,Dh] x k/v [B,H,Tk,Dh] with additive bias [B,1,Tq,Tk]."""
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(dh) + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _ffn_act(cfg: SSRModelConfig, deterministic: bool):
    """FFN activation per config (reference transformer.py accepts relu or
    the icefall DoubleSwish variants; shipped SSR uses relu)."""
    if cfg.activation == "relu":
        return jax.nn.relu
    from ..ops import scaling as _sc

    if cfg.activation == "double_swish":
        return _sc.double_swish
    if cfg.activation == "balanced_double_swish":
        return lambda x: _sc.balanced_double_swish(
            x, deterministic=deterministic)
    raise ValueError(cfg.activation)


def wrap_remat(body, mode: str):
    """Map a remat MODE string onto a (possibly checkpointed) layer body —
    shared by ``transformer_forward`` and the pipeline stage body
    (``parallel/pipeline.py``) so both paths run identical policies.

    "full": recompute every layer in the backward (lowest memory; REMAT_POLICY
    overrides the policy module-wide for probes). "dots"/"mixed": save matmul
    outputs, recompute elementwise only — viable when the attention is fused
    (no [B,H,S,S] dot output to keep); "mixed" additionally leaves every other
    UNROLLED layer un-rematted, which the unrolling caller arranges itself
    (under a scan it degrades to "dots"). "dots_masks": dots + the
    checkpoint_name-tagged bool dropout masks (~1 GB at 830M/B=8) so the
    backward skips both RNG regeneration and the bernoulli compare — judged by
    full-step interleaved A/B only (docs/DESIGN.md). "none": save everything.
    """
    if mode == "full":
        return (jax.checkpoint(body, policy=REMAT_POLICY)
                if REMAT_POLICY is not None else jax.checkpoint(body))
    if mode in ("dots", "mixed"):
        return jax.checkpoint(body, policy=jax.checkpoint_policies.dots_saveable)
    if mode == "dots_masks":
        return jax.checkpoint(
            body, policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_saveable,
                jax.checkpoint_policies.save_only_these_names("drop_mask")))
    if mode == "none":
        return body
    raise ValueError(f"remat mode {mode!r}")


def transformer_forward(
    params: Params,
    h: jnp.ndarray,
    bias: jnp.ndarray,
    cfg: SSRModelConfig,
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    dtype=jnp.float32,
    remat="full",  # "full"|"dots"|"dots_masks"|"mixed"|"none" (bools ok)
    act_sharding=None,
    unroll: bool = False,
    key_valid: Optional[jnp.ndarray] = None,
    flash_sharding=None,
) -> jnp.ndarray:
    """Full-sequence forward (training / prefill without cache capture).

    h: [B, S, D]; bias: [B, 1, S, S] additive. Returns [B, S, D] after the
    final LayerNorm (reference ``models/ssr.py:169-173``).

    remat: rematerialize each layer in the backward pass — without it the
    scan saves every layer's [B, H, S, S] attention matrix (the 830M model at
    B=8/S=1280 needs 41 GB of HLO temps; with remat it fits one v5e chip).
    With ``cfg.attn_impl == "flash"`` that matrix never materializes, so the
    caller can (and the trainer does) pass ``remat=False``.

    key_valid: [B, S] bool, True at un-padded positions — required when
    ``cfg.attn_impl == "flash"``; the fused kernel rebuilds the xy mask from
    causality + segment ids (``ops/flash_attention.py``) and ``bias`` is then
    unused (XLA dead-code-eliminates its construction).

    act_sharding: optional ``NamedSharding`` pinned onto the residual stream
    at every layer boundary. Passing e.g. ``P('dp', 'tp', None)`` gives
    Megatron-style SEQUENCE PARALLELISM: the norms/dropouts/residual adds run
    sequence-sharded over the tp group and XLA places all-gather /
    reduce-scatter around the attention and ffn blocks (numerics identical —
    ``tests/test_parallel.py::test_sequence_parallel_matches``).

    unroll: python-unroll the layer loop (static slices of the stacked
    params) instead of ``lax.scan``. Bit-identical outputs (same body, same
    key chain), but the scan TRANSPOSE accumulates per-layer parameter grads
    into the stacked [L, ...] arrays through dynamic-update-slice fusions
    that XLA does not alias in place — bare step 682 -> 432 ms (1.58x),
    production train step 682 -> 482 ms (1.41x, 6.0k -> 8.5k codec tokens/s)
    on the 830M at B=4/S~1200 on one v5e (tools/unroll_train_probe.py,
    tools/train_probe.py; the unstacked-param variant measures the same
    428 ms, so the stacked layout is kept). Costs longer compiles
    (L copies of the body), so tiny-config CPU tests default to the scan.
    """
    nhead, rate = cfg.nhead, cfg.trm_dropout
    act = _ffn_act(cfg, deterministic)
    h = h.astype(dtype)
    bias = bias.astype(jnp.float32)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    use_flash = cfg.attn_impl in ("flash", "splash")
    if use_flash and key_valid is None:
        raise ValueError(f"attn_impl={cfg.attn_impl!r} needs key_valid "
                         "(see ssr_forward)")

    def _pin(x):
        return (jax.lax.with_sharding_constraint(x, act_sharding)
                if act_sharding is not None else x)

    def _mha(q, k, v):
        if use_flash:
            from ..ops.flash_attention import flash_attend_xy

            mesh, spec = flash_sharding or (None, None)
            return flash_attend_xy(q, k, v, key_valid, mesh=mesh, spec=spec,
                                   impl=cfg.attn_impl)
        return _attend(q, k, v, bias)

    def body(carry, lp):
        h, key = carry
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        hn = layer_norm(h, lp["ln1_w"], lp["ln1_b"])
        qkv = hn @ lp["qkv_w"].astype(dtype) + lp["qkv_b"].astype(dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = _mha(_split_heads(q, nhead), _split_heads(k, nhead), _split_heads(v, nhead))
        attn = _merge_heads(attn) @ lp["out_w"].astype(dtype) + lp["out_b"].astype(dtype)
        h = _pin(h + _dropout(attn, rate, k1, deterministic))
        hn = layer_norm(h, lp["ln2_w"], lp["ln2_b"])
        ff = act(hn @ lp["ffn1_w"].astype(dtype) + lp["ffn1_b"].astype(dtype))
        ff = _dropout(ff, rate, k2, deterministic)
        ff = ff @ lp["ffn2_w"].astype(dtype) + lp["ffn2_b"].astype(dtype)
        h = _pin(h + _dropout(ff, rate, k3, deterministic))
        return (h, key), None

    mode = {True: "full", False: "none"}.get(remat, remat)
    scan_body = wrap_remat(body, mode)
    if unroll:
        carry = (_pin(h), rng)
        for l in range(cfg.num_layers):
            lp = jax.tree.map(lambda a: a[l], params["layers"])
            lbody = body if (mode == "mixed" and l % 2 == 0) else scan_body
            carry, _ = lbody(carry, lp)
        h = carry[0]
    else:
        (h, _), _ = jax.lax.scan(scan_body, (_pin(h), rng), params["layers"])
    return layer_norm(h, params["final_ln_w"], params["final_ln_b"])


def cache_stage_sizes(tmax: int, max_buckets: int = 8):
    """Telescoping-cache stage capacities: up to ``max_buckets`` multiples of
    a 128-aligned chunk ending at ``tmax`` (``inference.decode._staged_while``
    grows the KV cache through these)."""
    if tmax <= 128:
        return [tmax]
    raw = -(-tmax // max_buckets)  # ceil(tmax / max_buckets)
    chunk = max(128, -(-raw // 128) * 128)  # round up to 128
    n = -(-tmax // chunk)
    return [min((i + 1) * chunk, tmax) for i in range(n)]


class KVCache(NamedTuple):
    """Preallocated per-layer key/value buffers and the current fill length."""

    k: jnp.ndarray  # [L, B, H, Tmax, Dh]
    v: jnp.ndarray  # [L, B, H, Tmax, Dh]
    length: jnp.ndarray  # scalar int32: number of valid positions

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def init_kv_cache(cfg: SSRModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_layers, batch, cfg.nhead, max_len, cfg.head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.asarray(0, jnp.int32))


def transformer_prefill(
    params: Params,
    h: jnp.ndarray,
    bias: jnp.ndarray,
    cache: KVCache,
    cfg: SSRModelConfig,
    *,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, KVCache]:
    """Full forward over the prompt while filling the KV cache at offset
    ``cache.length`` (normally 0). Returns (hidden [B,S,D], cache)."""
    nhead = cfg.nhead
    act = _ffn_act(cfg, deterministic=True)
    h = h.astype(dtype)
    start = cache.length

    def body(carry, xs):
        h = carry
        lp, ck, cv = xs
        hn = layer_norm(h, lp["ln1_w"], lp["ln1_b"])
        qkv = hn @ lp["qkv_w"].astype(dtype) + lp["qkv_b"].astype(dtype)
        q, k, v = (_split_heads(t, nhead) for t in jnp.split(qkv, 3, axis=-1))
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, start, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, start, 0))
        attn = _merge_heads(_attend(q, k, v, bias))
        attn = attn @ lp["out_w"].astype(dtype) + lp["out_b"].astype(dtype)
        h = h + attn
        hn = layer_norm(h, lp["ln2_w"], lp["ln2_b"])
        ff = act(hn @ lp["ffn1_w"].astype(dtype) + lp["ffn1_b"].astype(dtype))
        h = h + ff @ lp["ffn2_w"].astype(dtype) + lp["ffn2_b"].astype(dtype)
        return h, (ck, cv)

    h, (new_k, new_v) = jax.lax.scan(body, h, (params["layers"], cache.k, cache.v))
    out = layer_norm(h, params["final_ln_w"], params["final_ln_b"])
    return out, KVCache(new_k, new_v, start + h.shape[1])


def transformer_decode_step_shared(
    params: Params,
    h_t: jnp.ndarray,  # [B, D] with B = n_groups * S (group-major rows)
    pfx: KVCache,  # prefix cache [L, n_groups, H, Tp, Dh], shared by chains
    gen: KVCache,  # generated cache [L, B, H, Tg, Dh], per chain
    key_banned: jnp.ndarray,  # [n_groups, 2] banned key range in the prefix
    cfg: SSRModelConfig,
    *,
    n_groups: int,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, KVCache]:
    """Decode step for seed-batched generation with a SHARED prompt cache.

    All S chains of a CFG group attend the same prompt, so the prefix K/V is
    stored once per group and read once per group per step (the naive layout
    reads it S times); per-chain caches hold only generated positions. The
    softmax runs over the concatenated [prefix ; generated] scores — exactly
    equivalent to single-cache attention, no online merge needed. Cache
    traffic is bounded by the caller's telescoping stages
    (``inference.decode._staged_while``): the whole CURRENT buffer is read,
    and the buffer grows with the generation.
    """
    nhead = cfg.nhead
    act = _ffn_act(cfg, deterministic=True)
    b, d = h_t.shape
    S = b // n_groups
    tp = pfx.max_len
    gpos = gen.length  # tokens generated so far (same for all chains)
    scale = 1.0 / math.sqrt(cfg.head_dim)
    h = h_t.astype(dtype)[:, None, :]

    idxp = jnp.arange(tp)[None, :]
    if key_banned.dtype == jnp.bool_:
        # explicit per-group banned-key mask [G, Tp] (multi-prompt layout:
        # ragged prompt/prefix lengths leave permanently-dead slots)
        pfx_banned = key_banned
    else:
        pfx_banned = (idxp >= pfx.length) | (
            (idxp >= key_banned[:, :1]) & (idxp < key_banned[:, 1:2])
        )  # [G, Tp]
    pfx_bias = jnp.where(pfx_banned, -1e9, 0.0).astype(jnp.float32)

    tg = gen.max_len

    def attend_layer(rl, q, k_buf, v_buf, pfx_k, pfx_v):
        """Joint softmax over [prefix ; gen[:rl]] — math identical to the
        full read, only the streamed gen slab shrinks."""
        gen_bias = jnp.where(jnp.arange(rl) > gpos, -1e9, 0.0
                             ).astype(jnp.float32)
        k_read, v_read = k_buf[:, :, :rl], v_buf[:, :, :rl]
        qg = (q * scale).reshape(n_groups, S, nhead, cfg.head_dim)
        # prefix scores: the group's K read ONCE for its S chains
        sp = jnp.einsum(
            "gshd,ghtd->gsht", qg.astype(dtype), pfx_k.astype(dtype),
            preferred_element_type=jnp.float32,
        ) + pfx_bias[:, None, None, :]
        sg = jnp.einsum(
            "bhd,bhtd->bht", (q * scale).astype(dtype),
            k_read.astype(dtype), preferred_element_type=jnp.float32,
        ).reshape(n_groups, S, nhead, rl) + gen_bias
        s_all = jnp.concatenate([sp, sg], axis=-1)
        p_all = jax.nn.softmax(s_all.astype(jnp.float32), axis=-1).astype(dtype)
        pp, pg = p_all[..., :tp], p_all[..., tp:]
        out_p = jnp.einsum("gsht,ghtd->gshd", pp, pfx_v.astype(dtype))
        out_g = jnp.einsum(
            "bht,bhtd->bhd", pg.reshape(b, nhead, rl), v_read.astype(dtype))
        return out_p.reshape(b, nhead, cfg.head_dim) + out_g

    new_k, new_v = gen.k, gen.v
    for l in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[l], params["layers"])
        hn = layer_norm(h, lp["ln1_w"], lp["ln1_b"])
        qkv = hn @ lp["qkv_w"].astype(dtype) + lp["qkv_b"].astype(dtype)
        q, k, v = (_split_heads(t, nhead) for t in jnp.split(qkv, 3, axis=-1))
        new_k = jax.lax.dynamic_update_slice(
            new_k, k[None].astype(new_k.dtype), (l, 0, 0, gpos, 0))
        new_v = jax.lax.dynamic_update_slice(
            new_v, v[None].astype(new_v.dtype), (l, 0, 0, gpos, 0))
        attn_h = attend_layer(tg, q[:, :, 0, :], new_k[l], new_v[l],
                              pfx.k[l], pfx.v[l])
        attn = attn_h.reshape(b, 1, d)
        attn = attn @ lp["out_w"].astype(dtype) + lp["out_b"].astype(dtype)
        h = h + attn
        hn = layer_norm(h, lp["ln2_w"], lp["ln2_b"])
        ff = act(hn @ lp["ffn1_w"].astype(dtype) + lp["ffn1_b"].astype(dtype))
        h = h + ff @ lp["ffn2_w"].astype(dtype) + lp["ffn2_b"].astype(dtype)
    out = layer_norm(h, params["final_ln_w"], params["final_ln_b"])
    return out[:, 0, :], KVCache(new_k, new_v, gpos + 1)


def transformer_decode_step_paged(
    params: Params,
    h_t: jnp.ndarray,  # [B, D], one row per chain (cond rows then uncond)
    pfx: KVCache,  # prefix cache [L, B, H, Tp, Dh], one row per chain
    gen: KVCache,  # generated cache [L, B, H, Tg, Dh]; ``length`` unused
    key_banned: jnp.ndarray,  # [B, Tp] bool dead-key mask in the prefix
    gen_len: jnp.ndarray,  # [B] int32 per-ROW write column in ``gen``
    cfg: SSRModelConfig,
    *,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, KVCache]:
    """Decode step with PER-ROW generated-cache write positions.

    The continuous-batching server (``inference.serve``) recycles cache rows:
    when a chain finishes, its slot is refilled with a new request whose
    generation restarts at column 0 of the SAME row while other chains are
    mid-flight at different columns. The shared-column layout
    (:func:`transformer_decode_step_shared`) cannot express that — its single
    ``gen.length`` scalar both writes and masks every row at the same column.
    Here each row writes its K/V at ``gen_len[row]`` (a scatter over rows)
    and attends gen columns ``<= gen_len[row]`` only, so a refilled row never
    sees the previous occupant's K/V. Positions are encoded additively at
    embed time (sine PE on ``y_pos``), so a chain's cache COLUMN index
    carries no positional meaning and rows may be reused freely.

    The caller does not advance ``gen_len`` for frozen (finished/parked)
    rows; they re-overwrite one dead column, which no live row ever reads.

    The current token's K/V is NOT written before attending — its score is
    appended as one extra softmax column (exactly equivalent) and ALL layers'
    K/V land in a single batched scatter at the end (removes the per-layer
    read-after-write dependency; the paged step then measures within 5% of
    the shared-column step at equal read size, tools/paged_step_probe.py).

    The full gen buffer is streamed every step (unlike the telescoping
    single/multi paths whose buffers are PHYSICALLY stage-sized): slicing a
    static read window out of the big buffer was measured SLOWER — XLA
    materializes the strided slice as a copy instead of shrinking the
    einsum read (tools/serve_probe.py round 2: 13.8 s -> 20.7 s for the same
    workload) — and row recycling caps the buffer at one request's length,
    so the full read costs only ~0.3 ms/step over the shared-column step at
    equal size (tools/paged_step_probe.py: 6.63 vs 6.29 ms on the 830M).
    """
    nhead = cfg.nhead
    act = _ffn_act(cfg, deterministic=True)
    b, d = h_t.shape
    tp = pfx.max_len
    tg = gen.max_len
    scale = 1.0 / math.sqrt(cfg.head_dim)
    h = h_t.astype(dtype)[:, None, :]

    pfx_bias = jnp.where(key_banned, -1e9, 0.0).astype(jnp.float32)  # [B, Tp]
    # strict: the current token is handled as an appended score column
    gen_bias = jnp.where(jnp.arange(tg)[None, :] < gen_len[:, None],
                         0.0, -1e9).astype(jnp.float32)  # [B, Tg]

    def attend_layer(q, k_cur, v_cur, k_gen, v_gen, pfx_k, pfx_v):
        qs = (q * scale).astype(dtype)  # [B, H, Dh]
        sp = jnp.einsum("bhd,bhtd->bht", qs, pfx_k.astype(dtype),
                        preferred_element_type=jnp.float32
                        ) + pfx_bias[:, None, :]
        sg = jnp.einsum("bhd,bhtd->bht", qs, k_gen.astype(dtype),
                        preferred_element_type=jnp.float32
                        ) + gen_bias[:, None, :]
        sc = jnp.einsum("bhd,bhd->bh", qs, k_cur.astype(dtype),
                        preferred_element_type=jnp.float32)[..., None]
        p_all = jax.nn.softmax(
            jnp.concatenate([sp, sg, sc], axis=-1), axis=-1).astype(dtype)
        out = jnp.einsum("bht,bhtd->bhd", p_all[..., :tp], pfx_v.astype(dtype))
        out += jnp.einsum("bht,bhtd->bhd", p_all[..., tp:-1],
                          v_gen.astype(dtype))
        out += p_all[..., -1:] * v_cur.astype(dtype)
        return out

    ks, vs = [], []
    for l in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[l], params["layers"])
        hn = layer_norm(h, lp["ln1_w"], lp["ln1_b"])
        qkv = hn @ lp["qkv_w"].astype(dtype) + lp["qkv_b"].astype(dtype)
        q, k, v = (_split_heads(t, nhead) for t in jnp.split(qkv, 3, axis=-1))
        k_cur, v_cur = k[:, :, 0, :], v[:, :, 0, :]
        ks.append(k_cur)
        vs.append(v_cur)
        attn_h = attend_layer(q[:, :, 0, :], k_cur, v_cur,
                              gen.k[l], gen.v[l], pfx.k[l], pfx.v[l])
        attn = attn_h.reshape(b, 1, d)
        attn = attn @ lp["out_w"].astype(dtype) + lp["out_b"].astype(dtype)
        h = h + attn
        hn = layer_norm(h, lp["ln2_w"], lp["ln2_b"])
        ff = act(hn @ lp["ffn1_w"].astype(dtype) + lp["ffn1_b"].astype(dtype))
        h = h + ff @ lp["ffn2_w"].astype(dtype) + lp["ffn2_b"].astype(dtype)
    # one batched scatter for all layers: rows write column gen_len[row]
    rows = jnp.arange(b)
    new_k = gen.k.at[:, rows, :, gen_len].set(
        jnp.stack(ks).astype(gen.k.dtype).transpose(1, 0, 2, 3))
    new_v = gen.v.at[:, rows, :, gen_len].set(
        jnp.stack(vs).astype(gen.v.dtype).transpose(1, 0, 2, 3))
    out = layer_norm(h, params["final_ln_w"], params["final_ln_b"])
    return out[:, 0, :], KVCache(new_k, new_v, gen.length)


def transformer_decode_step(
    params: Params,
    h_t: jnp.ndarray,
    cache: KVCache,
    key_banned: jnp.ndarray,
    cfg: SSRModelConfig,
    *,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, KVCache]:
    """One-token decode: h_t [B, D] at position cache.length.

    key_banned: [B, 2] int32 banned key RANGE [lo, hi) per batch row — text
    padding and the CFG-unconditional row's hidden prompt (reference
    ``models/ssr.py:632-634``). Future positions are masked automatically
    from ``cache.length``. Returns (out [B, D], cache + 1).

    Cache traffic is bounded by the caller's telescoping stages
    (``inference.decode._staged_while``): the whole CURRENT stage buffer is
    read each step, and the buffer grows with the generation.
    """
    nhead = cfg.nhead
    act = _ffn_act(cfg, deterministic=True)
    b, d = h_t.shape
    pos = cache.length
    h = h_t.astype(dtype)[:, None, :]  # [B, 1, D]

    def attend_layer(rl, q, k_buf, v_buf):
        idx = jnp.arange(rl)[None, :]
        banned = (idx > pos) | (
            (idx >= key_banned[:, :1]) & (idx < key_banned[:, 1:2])
        )
        bias = jnp.where(banned, -1e9, 0.0).astype(jnp.float32)[:, None, None, :]
        return _attend(q, k_buf[:, :, :rl].astype(dtype),
                       v_buf[:, :, :rl].astype(dtype), bias)

    # Python-unrolled layer loop with STATIC layer indices: each step writes
    # only the new token's K/V ([B,H,1,Dh]) in place and reads the cache for
    # attention. A lax.scan over layers would re-stack the whole cache as its
    # ys every token (hundreds of MB of HBM writes per step — measured 2x
    # step-time on v5e), so the hot decode path avoids it.
    new_k, new_v = cache.k, cache.v
    L = cfg.num_layers
    for l in range(L):
        lp = jax.tree.map(lambda a: a[l], params["layers"])
        hn = layer_norm(h, lp["ln1_w"], lp["ln1_b"])
        qkv = hn @ lp["qkv_w"].astype(dtype) + lp["qkv_b"].astype(dtype)
        q, k, v = (_split_heads(t, nhead) for t in jnp.split(qkv, 3, axis=-1))
        new_k = jax.lax.dynamic_update_slice(
            new_k, k[None].astype(new_k.dtype), (l, 0, 0, pos, 0))
        new_v = jax.lax.dynamic_update_slice(
            new_v, v[None].astype(new_v.dtype), (l, 0, 0, pos, 0))
        attn = _merge_heads(
            attend_layer(cache.max_len, q, new_k[l], new_v[l]))
        attn = attn @ lp["out_w"].astype(dtype) + lp["out_b"].astype(dtype)
        h = h + attn
        hn = layer_norm(h, lp["ln2_w"], lp["ln2_b"])
        ff = act(hn @ lp["ffn1_w"].astype(dtype) + lp["ffn1_b"].astype(dtype))
        h = h + ff @ lp["ffn2_w"].astype(dtype) + lp["ffn2_b"].astype(dtype)
    out = layer_norm(h, params["final_ln_w"], params["final_ln_b"])
    return out[:, 0, :], KVCache(new_k, new_v, pos + 1)
