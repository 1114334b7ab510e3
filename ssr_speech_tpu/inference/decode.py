"""Compiled autoregressive decode for SSR-Speech on TPU.

This replaces the reference's host-driven decode (``models/ssr.py:646-771``:
a python ``while True`` crossing host<->device every token) with a single
``lax.while_loop`` that runs entirely on device:

  - preallocated KV cache (``transformer.KVCache``) instead of growing
    ``torch.cat`` (``models/ssr.py:686``);
  - classifier-free guidance as a batch of [cond, uncond] rows with the
    stride predicate evaluated in-loop (``models/ssr.py:691-696``,
    README "fast CFG");
  - the full constrained-sampling state machine as vectorized masks:
    eos/sos/mts ban, first-K empty forcing, staggered EOG cascade across
    codebooks, silence-repetition penalty (``models/ssr.py:698-748``);
  - multi-span editing in ONE compiled program: when a span finishes, the
    loop feeds the next span's mask sentinel and keeps decoding with the same
    cache (the reference loops spans on host, ``models/ssr.py:646``).

Compilation is shape-bucketed for serving: text/prefix lengths are padded to
buckets with padded key positions masked, and the true lengths are traced
scalars — a new utterance reuses the compiled program instead of retracing
(the reference recompiles nothing but pays per-token python dispatch).

Host-side pre/post (tiny int arrays): building the interleaved prefix
(``ops.patterns.build_inference_prefix``) and reverting the delay pattern /
splicing spans (``ops.patterns``).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DecodeConfig, SSRModelConfig
from ..models import ssr as ssr_model
from ..models import transformer as trf
from ..ops import patterns
from ..ops.sampling import top_k_top_p_filter

NEG = -10000.0
POS = 10000.0


def _bucket(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _grow_cache(s, size):
    """Stage transition for :func:`_staged_while`: zero-pad the state's KV
    buffers to the next telescoping capacity (shared by all decode
    variants; state must carry the cache in a ``cache`` field)."""
    pad = size - s.cache.max_len
    spec = [(0, 0), (0, 0), (0, 0), (0, pad), (0, 0)]
    return s._replace(cache=trf.KVCache(
        jnp.pad(s.cache.k, spec), jnp.pad(s.cache.v, spec), s.cache.length))


def _staged_while(cond_fn, body, init, sizes, grow):
    """Run a while loop in cache-size stages (telescoping KV cache).

    The decode attention streams the whole preallocated cache from HBM every
    step, so a mostly-empty buffer wastes bandwidth early in the generation.
    ``sizes`` are static capacities; each stage runs ``body`` with the cache
    at ``sizes[i]`` until full (``cond_fn(s, size)`` must gate on remaining
    room), then ``grow(state, next_size)`` zero-pads the buffers ONCE and the
    next stage continues — per-step reads shrink to the live stage size with
    no conditionals in the hot loop, and the stage-transition copies total
    one cache pass per stage. Bit-exact: the computation per step is
    unchanged, only buffer capacity differs."""
    state = init
    for i, size in enumerate(sizes):
        if i > 0:
            state = grow(state, size)
        state = jax.lax.while_loop(
            lambda s, size=size: cond_fn(s, size), body, state)
    return state


class ChainState(NamedTuple):
    """Vectorized per-chain decode state shared by EVERY decode variant
    (single = 1 chain, seed-batched, multi-prompt; the continuous-batching
    server extends it with slot fields). All chain fields are [S]-leading;
    ``y_pos`` is a scalar when every chain shares positions (single/seed
    paths) and [S] on the multi-prompt path."""

    cache: trf.KVCache
    key: jax.Array
    y_pos: jnp.ndarray
    next_tokens: jnp.ndarray  # [S, K] int32 token to feed this step
    out: jnp.ndarray  # [S, K, CAP] sampled tokens, spans concatenated
    out_len: jnp.ndarray  # [S]
    span_idx: jnp.ndarray  # [S]
    span_end: jnp.ndarray  # [S, num_task] out_len after each span
    num_gen: jnp.ndarray
    num_eog: jnp.ndarray
    prev_token: jnp.ndarray
    consec_silence: jnp.ndarray
    num_cfg: jnp.ndarray
    done: jnp.ndarray  # [S] bool


def _static_ban(ts):
    """eos/sos/all-mask-sentinel column ban [1, 1, card]
    (models/ssr.py:699-703), shared by every decode variant."""
    cols = jnp.arange(ts.cardinality)[None, None, :]
    return (cols == ts.eos) | (cols == ts.sos) | (
        (cols >= ts.mts) & (cols < ts.mts + ts.max_n_spans))


def _init_chain_state(cache, rng, y_pos0, sentinel_ids, S, K, num_task, ts,
                      cap_total):
    return ChainState(
        cache=cache, key=rng,
        y_pos=jnp.asarray(y_pos0, jnp.int32),
        next_tokens=jnp.broadcast_to(sentinel_ids[0], (S, K)).astype(jnp.int32),
        out=jnp.full((S, K, cap_total), ts.empty, jnp.int32),
        out_len=jnp.zeros((S,), jnp.int32),
        span_idx=jnp.zeros((S,), jnp.int32),
        span_end=jnp.zeros((S, num_task), jnp.int32),
        num_gen=jnp.zeros((S,), jnp.int32),
        num_eog=jnp.zeros((S,), jnp.int32),
        prev_token=jnp.full((S,), -1, jnp.int32),
        consec_silence=jnp.zeros((S,), jnp.int32),
        num_cfg=jnp.ones((S,), jnp.int32),
        done=jnp.zeros((S,), bool),
    )


def _embed_step_tokens(params, cfg: SSRModelConfig, tokens: jnp.ndarray,
                       pe: jnp.ndarray, y_pos, batch: int, dtype):
    """[K] token ids -> [B, D] summed codebook embedding + audio pos emb."""
    embs = params["audio_emb"]
    h = jnp.zeros((cfg.d_model,), jnp.float32)
    for k in range(cfg.n_codebooks):
        h = h + embs[k][tokens[k]]
    h = h + params["audio_pos_alpha"][0] * jax.lax.dynamic_slice_in_dim(pe, y_pos, 1, 0)[0]
    return jnp.broadcast_to(h, (batch, cfg.d_model)).astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dec", "num_task", "cap_total", "aug_text",
                     "dtype_name", "tmax_total"),
)
def _generate_impl(
    params,
    cache: trf.KVCache,
    key_banned: jnp.ndarray,
    rng: jax.Array,
    sentinel_ids: jnp.ndarray,  # [MAX_SPANS] int32
    x_len: jnp.ndarray,  # scalar int32: true text length (traced, no retrace)
    y_pos0: jnp.ndarray,  # scalar int32: audio position of the first sentinel
    *,
    cfg: SSRModelConfig,
    dec: DecodeConfig,
    num_task: int,
    cap_total: int,
    aug_text: bool,
    dtype_name: str = "bfloat16",
    tmax_total: Optional[int] = None,
):
    dtype = jnp.dtype(dtype_name)
    K = cfg.n_codebooks
    ts = cfg.tokens
    batch = cache.k.shape[1]
    pe = ssr_model.sine_table(cfg.max_position, cfg.d_model)
    silence = jnp.asarray(dec.silence_tokens, jnp.int32)
    length_cap = x_len * dec.length_cap_mult
    static_ban = _static_ban(ts)

    def cond(s: ChainState, size):
        return ((~jnp.all(s.done)) & (jnp.max(s.out_len) < cap_total)
                & (s.cache.length < size))

    def body(s: ChainState):
        key, k_samp = jax.random.split(s.key)
        h = _embed_step_tokens(params, cfg, s.next_tokens[0], pe, s.y_pos,
                               batch, dtype)
        out_h, cache = trf.transformer_decode_step(
            params["decoder"], h, s.cache, key_banned, cfg, dtype=dtype,
        )
        logits = ssr_model.predict_logits(params, out_h)  # [B, K, card] f32
        lg, num_cfg = _mix_cfg(logits, s, dec, 1, aug_text)
        upd = _advance_chains(
            s, lg, k_samp, num_cfg, ts=ts, dec=dec, num_task=num_task,
            length_cap=length_cap, n_tasks=num_task,
            sentinel_ids=sentinel_ids, static_ban=static_ban, silence=silence)
        return ChainState(cache=cache, key=key, **upd)

    init = _init_chain_state(cache, rng, y_pos0, sentinel_ids, 1, K,
                             num_task, ts, cap_total)

    # telescoping cache: the prefill allocated only the smallest stage that
    # holds [x ; prefix]; grow toward tmax_total as generation proceeds
    total = tmax_total if tmax_total is not None else cache.max_len
    sizes = [cache.max_len] + [
        s for s in trf.cache_stage_sizes(total) if s > cache.max_len]

    final = _staged_while(cond, body, init, sizes, _grow_cache)
    return final.out[0], final.span_end[0], final.out_len[0]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dec", "num_task", "cap_total", "aug_text",
                     "n_samples", "dtype_name"),
)
def _generate_batched_impl(
    params,
    pfx: trf.KVCache,  # shared prompt cache [L, n_groups, H, Tp, Dh]
    key_banned: jnp.ndarray,  # [n_groups, 2]
    rng: jax.Array,
    sentinel_ids: jnp.ndarray,
    x_len: jnp.ndarray,
    y_pos0: jnp.ndarray,
    *,
    cfg: SSRModelConfig,
    dec: DecodeConfig,
    num_task: int,
    cap_total: int,
    aug_text: bool,
    n_samples: int,
    dtype_name: str = "bfloat16",
):
    """Seed-batched generation: S independent sampling chains over the same
    prompt in ONE while-loop. The reference decodes ``sample_batch_size``
    seeds sequentially (inference_v2.py:331-337); on TPU the weight reads
    amortize across the batch, so S samples cost barely more than one.

    The prompt KV cache is SHARED: it is built once for [cond, uncond] and
    read once per group per step (a per-chain copy would multiply the cache
    traffic by S); each chain carries only its generated-position cache.

    Batch layout: rows [cond_0..cond_{S-1} ; uncond_0..uncond_{S-1}].
    Returns (out [S, K, CAP], span_end [S, num_task], out_len [S]).
    """
    dtype = jnp.dtype(dtype_name)
    S = n_samples
    K = cfg.n_codebooks
    ts = cfg.tokens
    n_groups = pfx.k.shape[1]
    batch = n_groups * S
    gen_sizes = trf.cache_stage_sizes(_bucket(cap_total + 8, 128))
    gen0 = trf.init_kv_cache(cfg, batch, gen_sizes[0], dtype=pfx.k.dtype)
    pe = ssr_model.sine_table(cfg.max_position, cfg.d_model)
    silence = jnp.asarray(dec.silence_tokens, jnp.int32)
    length_cap = x_len * dec.length_cap_mult
    static_ban = _static_ban(ts)

    def embed_rows(tokens, y_pos):
        embs = params["audio_emb"]
        h = 0.0
        for k in range(cfg.n_codebooks):
            h = h + embs[k][tokens[:, k]]  # [S, D]
        h = h + params["audio_pos_alpha"][0] * jax.lax.dynamic_slice_in_dim(pe, y_pos, 1, 0)
        if aug_text:
            h = jnp.concatenate([h, h], axis=0)  # uncond rows share inputs
        return h.astype(dtype)

    def cond_fn(s, size):
        return ((~jnp.all(s.done)) & (jnp.max(s.out_len) < cap_total)
                & (s.cache.length < size))

    def body(s):
        key, k_samp = jax.random.split(s.key)
        h = embed_rows(s.next_tokens, s.y_pos)
        out_h, cache = trf.transformer_decode_step_shared(
            params["decoder"], h, pfx, s.cache, key_banned, cfg,
            n_groups=n_groups, dtype=dtype,
        )
        logits = ssr_model.predict_logits(params, out_h)  # [B, K, card]
        lg, num_cfg = _mix_cfg(logits, s, dec, S, aug_text)
        upd = _advance_chains(
            s, lg, k_samp, num_cfg, ts=ts, dec=dec, num_task=num_task,
            length_cap=length_cap, n_tasks=num_task,
            sentinel_ids=sentinel_ids, static_ban=static_ban, silence=silence)
        return ChainState(cache=cache, key=key, **upd)

    init = _init_chain_state(gen0, rng, y_pos0, sentinel_ids, S, K,
                             num_task, ts, cap_total)

    final = _staged_while(cond_fn, body, init, gen_sizes, _grow_cache)
    return final.out, final.span_end, final.out_len


def _check_positions(cfg: SSRModelConfig, prefill_need: int, gen_max: int,
                     where: str):
    """Positional-table capacity checks (cfg.max_position; the reference
    pre-builds 4000 rows, modules/embedding.py:67).

    The PREFILL embeds padded text/prefix rows directly — exceeding the
    table is a hard error (otherwise a cryptic dynamic-slice failure;
    aug_context doubles both lengths). GENERATION clips its position lookup
    to the last table row, so exceeding there only degrades quality — warn
    rather than break decode paths whose caps are far above what the length
    cap lets them actually generate."""
    if prefill_need > cfg.max_position:
        raise ValueError(
            f"{where}: prompt needs {prefill_need} positions > "
            f"cfg.max_position={cfg.max_position}; raise max_position or "
            f"shorten the input (aug_context doubles audio+text lengths)")
    if gen_max > cfg.max_position:
        import logging

        logging.getLogger(__name__).warning(
            "%s: generation may reach position %d > max_position=%d; "
            "positions clip to the last sine row beyond that (consider "
            "raising max_position)", where, gen_max, cfg.max_position)


def build_text_rows(xs, sx_pad: int, cfg: SSRModelConfig, dec: DecodeConfig,
                    uncond_rng, uncond_xs=None):
    """Pad conditional text rows and, under CFG, append the uncond rows.

    xs: list of 1-D int arrays. Returns (xb [R, sx_pad], x_lens_r [R]) with
    R = len(xs) (or 2x under aug_text). cfg_pretrained uses the reserved
    token over each row's true length (``models/ssr.py:584-588``); otherwise
    rows are random text drawn from ``uncond_rng`` (fresh per run, as the
    reference samples them), unless explicit ``uncond_xs`` rows are given
    (torch-parity tests replay the reference's draw). Shared by EVERY decode
    front-end — :func:`generate`, :func:`generate_batch`,
    :func:`generate_multi` and the continuous-batching server — so their
    prompt construction cannot drift."""
    S = len(xs)
    x_rows = np.full((S, sx_pad), cfg.text_pad_token, np.int32)
    x_lens = np.zeros(S, np.int32)
    for i, x in enumerate(xs):
        x_rows[i, : len(x)] = x
        x_lens[i] = len(x)
    if not dec.aug_text:
        return x_rows, x_lens
    if uncond_xs is not None:
        uncond = np.full((S, sx_pad), cfg.text_pad_token, np.int32)
        for i, u in enumerate(uncond_xs):
            uncond[i, : len(u)] = u
    elif dec.cfg_pretrained:
        uncond = np.full((S, sx_pad), cfg.text_pad_token, np.int32)
        for i in range(S):
            uncond[i, : x_lens[i]] = cfg.text_vocab_size - 1
    else:
        # range INCLUDES the pad id, matching the reference exactly
        # (models/ssr.py:574 randint over text_vocab_size + 1)
        uncond = np.asarray(jax.random.randint(
            uncond_rng, (S, sx_pad), 0, cfg.n_text_tokens)).astype(np.int32)
    return (np.concatenate([x_rows, uncond], axis=0),
            np.concatenate([x_lens, x_lens]))


def _apply_aug_context(dec: DecodeConfig, x, y, mask_intervals,
                       prompt_x, prompt_y):
    """aug_context prepend (reference models/ssr.py:563-593): when the flag
    is set AND the total masked content is shorter than 2 s (100 codec
    frames) AND a prompt is supplied, prepend the prompt audio+text as extra
    context. Returns (x, y, mask_intervals, trim_frames); the caller trims
    ``trim_frames`` codec frames off the assembled outputs
    (:func:`_trim_context`). Shared by every decode front-end."""
    mask_intervals = list(mask_intervals)
    context_len = sum(e - s for s, e in mask_intervals)
    if not (dec.aug_context and context_len < 2 * dec.codec_sr):
        return x, y, mask_intervals, 0
    if prompt_x is None or prompt_y is None or not np.asarray(prompt_x).size:
        return x, y, mask_intervals, 0
    prompt_y = np.asarray(prompt_y, np.int32)
    trim = prompt_y.shape[1]
    y = np.concatenate([prompt_y, y], axis=1)
    x = np.concatenate([np.asarray(prompt_x, np.int32), x])
    mask_intervals = [(s + trim, e + trim) for s, e in mask_intervals]
    return x, y, mask_intervals, trim


def _trim_context(result, trim: int):
    """Drop the prepended aug_context frames from an assembled result
    (reference models/ssr.py:806-810)."""
    if not trim:
        return result
    codes, marks, out_iv, nm = result
    return (codes[:, :, trim:], marks[:, trim:],
            [(s - trim, e - trim) for s, e in out_iv],
            [(s - trim, e - trim) for s, e in nm])


def generate_batch(
    params,
    cfg: SSRModelConfig,
    dec: DecodeConfig,
    x: np.ndarray,
    y: np.ndarray,
    mask_intervals: Sequence[Tuple[int, int]],
    rng: jax.Array,
    n_samples: int,
    *,
    uncond_x: Optional[np.ndarray] = None,
    prompt_x: Optional[np.ndarray] = None,
    prompt_y: Optional[np.ndarray] = None,
    tmax: Optional[int] = None,
    dtype_name: str = "bfloat16",
    x_bucket: int = 64,
    prefix_bucket: int = 128,
) -> List[Tuple[np.ndarray, np.ndarray, List[Tuple[int, int]], List[Tuple[int, int]]]]:
    """Generate ``n_samples`` independent sampling chains for one prompt in a
    single compiled loop. Returns a list of per-chain (codes, marks,
    out_intervals, nm_intervals), same contract as :func:`generate` —
    including the aug_context prepend for short spans when
    ``prompt_x``/``prompt_y`` are supplied."""
    ts = cfg.tokens
    K = cfg.n_codebooks
    x = np.asarray(x, np.int32)
    y = np.asarray(y, np.int32)
    x, y, mask_intervals, trim = _apply_aug_context(
        dec, x, y, mask_intervals, prompt_x, prompt_y)
    prefix, _, num_task, nm = patterns.build_inference_prefix(y, mask_intervals, ts)
    sentinels = np.arange(ts.mts, ts.mts + ts.max_n_spans, dtype=np.int32)

    x_len = int(x.shape[0])
    p_len = int(prefix.shape[1])
    cap_total = dec.max_gen_per_span * num_task
    sx_pad = _bucket(max(x_len, 1), x_bucket)
    p_pad = _bucket(max(p_len, 1), prefix_bucket)
    gen_bound = p_len + min(cap_total,
                            max(x_len * dec.length_cap_mult - p_len, 0)
                            + num_task * (K + 2))
    _check_positions(cfg, max(sx_pad, p_pad), gen_bound, "generate_batch")
    xb_padded, _ = build_text_rows(
        [x], sx_pad, cfg, dec, jax.random.fold_in(rng, 7),
        uncond_xs=None if uncond_x is None else [uncond_x])
    prefix_padded = np.full((K, p_pad), ts.empty, np.int32)
    prefix_padded[:, :p_len] = prefix
    if tmax is None:
        # shared-prefix layout: the prompt cache holds ONLY the prompt
        tmax = _bucket(sx_pad + p_pad + 8, 256)

    cache, key_banned = _prefill_impl(
        params, jnp.asarray(xb_padded), jnp.asarray(prefix_padded),
        jnp.asarray(x_len, jnp.int32), jnp.asarray(p_len, jnp.int32),
        cfg=cfg, tmax=tmax, dtype_name=dtype_name,
        cfg_pretrained=dec.cfg_pretrained, aug_text=dec.aug_text,
        uncond_row_start=1 if dec.aug_text else -1,
    )
    out, span_end, out_len = _generate_batched_impl(
        params, cache, key_banned, rng, jnp.asarray(sentinels),
        jnp.asarray(x_len, jnp.int32), jnp.asarray(p_len, jnp.int32),
        cfg=cfg, dec=dec, num_task=num_task, cap_total=cap_total,
        aug_text=dec.aug_text, n_samples=n_samples, dtype_name=dtype_name,
    )
    out = np.asarray(out)
    span_end = np.asarray(span_end)

    return [_trim_context(
        assemble_result(y, nm, out[s], span_end[s], num_task, K), trim)
            for s in range(n_samples)]


@functools.partial(
    jax.jit, static_argnames=("cfg", "tmax", "dtype_name", "cfg_pretrained",
                              "aug_text", "uncond_row_start")
)
def _prefill_impl(
    params,
    x: jnp.ndarray,  # [B, Sx_pad] text ids padded to a bucket
    y_prefix: jnp.ndarray,  # [K, P_pad] prefix padded to a bucket
    x_len: jnp.ndarray,  # scalar int32 true text length
    p_len: jnp.ndarray,  # scalar int32 true prefix length
    *,
    cfg: SSRModelConfig,
    tmax: int,
    dtype_name: str = "bfloat16",
    cfg_pretrained: bool = False,
    aug_text: bool = False,
    uncond_row_start: int = 1,
):
    """Fill the KV cache with [x ; y_prefix]. Padded x positions are banned as
    keys forever; padded prefix tail slots hold garbage K/V but sit beyond
    ``cache.length`` and are overwritten by subsequent decode steps before
    they ever become attendable. Rows [uncond_row_start, B) are the
    CFG-unconditional rows (batched-seed layout stacks all cond rows first)."""
    dtype = jnp.dtype(dtype_name)
    B, sx = x.shape
    P = y_prefix.shape[1]
    pe = ssr_model.sine_table(cfg.max_position, cfg.d_model)

    x_h = ssr_model.embed_text(params, cfg, x, pe)
    y_tok = y_prefix.T[None]  # [1, P, K]
    y_h = ssr_model.embed_audio_tokens(params, cfg, jnp.broadcast_to(y_tok, (B, P, cfg.n_codebooks)))
    y_h = ssr_model.apply_audio_pos(params, y_h, pe, 0)
    h = jnp.concatenate([x_h, y_h], axis=1).astype(dtype)

    s = sx + P
    idx = jnp.arange(s)
    is_y_col = idx >= sx
    tri = idx[None, :] > idx[:, None]
    banned = jnp.logical_or(tri, (~is_y_col)[:, None] & is_y_col[None, :])
    banned = jnp.broadcast_to(banned, (B, s, s))
    # text padding: positions [x_len, sx) never attendable
    x_pad_keys = (idx >= x_len) & (idx < sx)
    banned = banned | x_pad_keys[None, None, :]
    # banned key RANGES [lo, hi) per row for the decode steps
    lo = jnp.full((B,), 0, jnp.int32) + x_len
    hi = jnp.full((B,), sx, jnp.int32)
    # key ban for CFG-pretrained uncond rows: only their first text token
    # visible (reference models/ssr.py:632-634)
    if aug_text and cfg_pretrained and uncond_row_start >= 0:
        uncond_ban_keys = (idx >= 1) & (idx < sx)
        banned = banned.at[uncond_row_start:].set(
            banned[uncond_row_start:] | uncond_ban_keys[None, None, :])
        lo = lo.at[uncond_row_start:].set(1)
    key_banned = jnp.stack([lo, hi], axis=1)  # [B, 2]

    bias = jnp.where(banned, -1e9, 0.0)[:, None, :, :].astype(jnp.float32)

    cache = trf.init_kv_cache(cfg, B, tmax, dtype=dtype)
    _, cache = trf.transformer_prefill(params["decoder"], h, bias, cache, cfg, dtype=dtype)
    # true fill point: padded-x block is length sx (slots stay banned), the
    # prefix is only valid up to p_len
    cache = cache._replace(length=jnp.asarray(sx, jnp.int32) + p_len)
    return cache, key_banned


def generate(
    params,
    cfg: SSRModelConfig,
    dec: DecodeConfig,
    x: np.ndarray,  # [Sx] int phoneme ids (conditional row)
    y: np.ndarray,  # [K, T] codec tokens of the source audio
    mask_intervals: Sequence[Tuple[int, int]],
    rng: jax.Array,
    *,
    uncond_x: Optional[np.ndarray] = None,
    prompt_x: Optional[np.ndarray] = None,
    prompt_y: Optional[np.ndarray] = None,
    tmax: Optional[int] = None,
    dtype_name: str = "bfloat16",
    x_bucket: int = 64,
    prefix_bucket: int = 128,
    tmax_bucket: int = 512,
) -> Tuple[np.ndarray, np.ndarray, List[Tuple[int, int]], List[Tuple[int, int]]]:
    """End-to-end span-infilling generation for one sample.

    Returns (codes [1, K, T'], marks [1, T'], out_intervals, nm_intervals)
    mirroring the reference ``SSR_Speech.inference`` outputs
    (``models/ssr.py:786-812``).

    aug_context (reference models/ssr.py:563-593): when enabled and the total
    masked content is shorter than 2 s (100 codec frames), the prompt
    audio+text are prepended as extra context and trimmed from the outputs.
    """
    ts = cfg.tokens
    K = cfg.n_codebooks
    x = np.asarray(x, np.int32)
    y = np.asarray(y, np.int32)
    x, y, mask_intervals, trim = _apply_aug_context(
        dec, x, y, mask_intervals, prompt_x, prompt_y)

    prefix, mask_positions, num_task, nm = patterns.build_inference_prefix(
        y, mask_intervals, ts
    )
    sentinels = np.arange(ts.mts, ts.mts + ts.max_n_spans, dtype=np.int32)

    x_len = int(x.shape[0])
    p_len = int(prefix.shape[1])
    cap_total = dec.max_gen_per_span * num_task

    # pad to compile-stable buckets
    sx_pad = _bucket(max(x_len, 1), x_bucket)
    p_pad = _bucket(max(p_len, 1), prefix_bucket)
    # audio positions run to p_len + generated steps; generation is bounded
    # by BOTH the per-span cap and the length cap (x_len * mult triggers
    # EOG, plus a K-step cascade and the sentinel feeds of later spans)
    gen_bound = p_len + min(cap_total,
                            max(x_len * dec.length_cap_mult - p_len, 0)
                            + num_task * (K + 2))
    _check_positions(cfg, max(sx_pad, p_pad), gen_bound, "generate")
    xb_padded, _ = build_text_rows(
        [x], sx_pad, cfg, dec, jax.random.fold_in(rng, 7),
        uncond_xs=None if uncond_x is None else [uncond_x])
    prefix_padded = np.full((K, p_pad), ts.empty, np.int32)
    prefix_padded[:, :p_len] = prefix

    if tmax is None:
        tmax = _bucket(sx_pad + p_pad + cap_total + num_task + 8, tmax_bucket)

    # prefill into the smallest telescoping stage that holds [x ; prefix]
    # (+1 slot so the first decode write fits); _generate_impl grows it
    need = sx_pad + p_pad + 1
    tmax0 = next((s for s in trf.cache_stage_sizes(tmax) if s >= need),
                 tmax)
    cache, key_banned = _prefill_impl(
        params, jnp.asarray(xb_padded), jnp.asarray(prefix_padded),
        jnp.asarray(x_len, jnp.int32), jnp.asarray(p_len, jnp.int32),
        cfg=cfg, tmax=tmax0, dtype_name=dtype_name,
        cfg_pretrained=dec.cfg_pretrained, aug_text=dec.aug_text,
    )
    out, span_end, total_len = _generate_impl(
        params, cache, key_banned, rng, jnp.asarray(sentinels),
        jnp.asarray(x_len, jnp.int32), jnp.asarray(p_len, jnp.int32),
        cfg=cfg, dec=dec, num_task=num_task,
        cap_total=cap_total, aug_text=dec.aug_text, dtype_name=dtype_name,
        tmax_total=tmax,
    )
    out = np.asarray(out)
    span_end = np.asarray(span_end)

    return _trim_context(assemble_result(y, nm, out, span_end, num_task, K),
                         trim)


# --------------------------------------------------------------- multi-prompt

def _advance_chains(s, lg, k_samp, num_cfg, *, ts, dec, num_task,
                    length_cap, n_tasks, sentinel_ids, static_ban, silence):
    """One step of per-chain constrained-sampling bookkeeping, shared by
    :func:`_generate_multi_impl` and the continuous-batching server
    (``inference.serve``).

    ``s`` is any NamedTuple carrying the vectorized chain fields (y_pos,
    next_tokens, out, out_len, span_idx, span_end, num_gen, num_eog,
    prev_token, consec_silence, num_cfg, done); ``lg`` the CFG-mixed logits
    [S, K, card]; ``num_cfg`` the caller's post-mix stride counter. Applies
    the reference's sampling state machine (``models/ssr.py:698-748``:
    eos/sos/mts ban, leading-empty forcing, EOG cascade, silence-repetition
    penalty, length caps) vectorized over chains, samples, and advances span
    /done state. Returns a dict of updated fields (frozen chains unchanged).
    """
    S, K, card = lg.shape
    rows = jnp.arange(K)[None, :, None]
    cols = jnp.arange(card)[None, None, :]

    lg = jnp.where(static_ban, NEG, lg)
    lg = jnp.where((rows > s.num_gen[:, None, None]) & (cols == ts.empty),
                   POS, lg)
    in_cascade = (s.num_eog > 0)[:, None, None]
    casc_ban = in_cascade & (rows > s.num_eog[:, None, None]) & (
        (cols == ts.eog) | (cols == ts.empty))
    noeog_ban = (~in_cascade) & (rows >= 1) & (cols == ts.eog)
    lg = jnp.where(casc_ban | noeog_ban, NEG, lg)
    if dec.stop_repetition > 0:
        is_sil_prev = jnp.any(silence[None, :] == s.prev_token[:, None], axis=1)
        apply_pen = (s.num_eog == 0) & is_sil_prev & (
            s.consec_silence > dec.stop_repetition)
        factor = (s.consec_silence - (dec.stop_repetition - 1)).astype(jnp.float32)
        srow = jnp.arange(S)
        prev_ix = jnp.clip(s.prev_token, 0, card - 1)
        prev_logit = lg[srow, 0, prev_ix]
        pen = jnp.where(prev_logit < 0, prev_logit * factor, prev_logit / factor)
        lg = lg.at[srow, 0, prev_ix].set(jnp.where(apply_pen, pen, prev_logit))

    lgt = lg / dec.temperature if dec.temperature != 1.0 else lg
    lgt = top_k_top_p_filter(lgt, top_k=dec.top_k, top_p=dec.top_p)
    samples = jax.random.categorical(k_samp, lgt, axis=-1).astype(jnp.int32)

    row_ids = jnp.arange(K)[None, :]
    casc_samples = jnp.where(row_ids < s.num_eog[:, None], ts.empty, samples)
    casc_samples = jnp.where(row_ids == s.num_eog[:, None], ts.eog, casc_samples)
    too_long = (s.y_pos + 1) > length_cap
    span_cap = s.num_gen >= (dec.max_gen_per_span - K)
    argmax0 = jnp.argmax(lg[:, 0], axis=-1)
    trigger = (samples[:, 0] == ts.eog) | (argmax0 == ts.eog) | too_long | span_cap
    plain = samples.at[:, 0].set(jnp.where(trigger, ts.eog, samples[:, 0]))
    in_c1 = s.num_eog > 0
    new_samples = jnp.where(in_c1[:, None], casc_samples, plain)
    num_eog = jnp.where(in_c1, s.num_eog + 1, jnp.where(trigger, 1, 0))
    s0 = plain[:, 0]
    is_sil = jnp.any(silence[None, :] == s0[:, None], axis=1) & (s0 == s.prev_token)
    consec = jnp.where(in_c1, s.consec_silence,
                       jnp.where(is_sil, s.consec_silence + 1, 0))
    prev = jnp.where(in_c1, s.prev_token, s0)

    active = ~s.done
    srow = jnp.arange(S)
    cur = s.out[srow[:, None], jnp.arange(K)[None, :], s.out_len[:, None]]
    out = s.out.at[srow[:, None], jnp.arange(K)[None, :],
                   s.out_len[:, None]].set(
        jnp.where(active[:, None], new_samples, cur))
    out_len = jnp.where(active, s.out_len + 1, s.out_len)
    num_gen = jnp.where(active, s.num_gen + 1, s.num_gen)

    span_done = active & (num_eog == K)
    span_end = jnp.where(
        span_done[:, None]
        & (jnp.arange(num_task)[None, :] == s.span_idx[:, None]),
        out_len[:, None], s.span_end)
    span_idx = jnp.where(span_done, s.span_idx + 1, s.span_idx)
    done = s.done | (span_done & (span_idx >= n_tasks))
    next_sent = sentinel_ids[jnp.minimum(span_idx, num_task - 1)]
    next_tokens = jnp.where(span_done[:, None],
                            jnp.broadcast_to(next_sent[:, None], (S, K)),
                            new_samples)
    num_gen = jnp.where(span_done, 0, num_gen)
    num_eog = jnp.where(span_done, 0, num_eog)
    num_eog = jnp.where(s.done, s.num_eog, num_eog)
    prev = jnp.where(span_done, -1, jnp.where(s.done, s.prev_token, prev))
    consec = jnp.where(span_done, 0,
                       jnp.where(s.done, s.consec_silence, consec))
    num_cfg = jnp.where(span_done, 1, jnp.where(s.done, s.num_cfg, num_cfg))
    next_tokens = jnp.where(s.done[:, None], s.next_tokens, next_tokens)

    return dict(y_pos=s.y_pos + 1, next_tokens=next_tokens, out=out,
                out_len=out_len, span_idx=span_idx, span_end=span_end,
                num_gen=num_gen, num_eog=num_eog, prev_token=prev,
                consec_silence=consec, num_cfg=num_cfg, done=done)


def _mix_cfg(logits, s, dec, S, aug_text):
    """CFG stride mix over [cond; uncond] rows (``models/ssr.py:691-696``).
    Returns (mixed logits [S, K, card], interim per-chain stride counter)."""
    if not aug_text:
        return logits, s.num_cfg
    cond_l, uncond_l = logits[:S], logits[S:]
    do_mix = (s.num_cfg == dec.cfg_stride)[:, None, None]
    lg = jnp.where(do_mix, dec.cfg_coef * cond_l
                   + (1.0 - dec.cfg_coef) * uncond_l, cond_l)
    num_cfg = jnp.where(s.num_cfg == dec.cfg_stride, 1, s.num_cfg + 1)
    return lg, num_cfg


@functools.partial(
    jax.jit, static_argnames=("cfg", "tmax", "dtype_name", "cfg_pretrained",
                              "aug_text")
)
def _prefill_multi_impl(
    params,
    x: jnp.ndarray,  # [R, Sx_pad] rows = [cond_0..cond_{S-1}, uncond_0..]
    y_prefix: jnp.ndarray,  # [S, K, P_pad] per-prompt prefixes
    x_lens: jnp.ndarray,  # [R] true text lengths
    p_lens: jnp.ndarray,  # [S] true prefix lengths
    *,
    cfg: SSRModelConfig,
    tmax: int,
    dtype_name: str = "bfloat16",
    cfg_pretrained: bool = False,
    aug_text: bool = False,
):
    """Prefill for DIFFERENT prompts in one batch. Ragged text/prefix lengths
    leave permanently-dead key slots per row (the generated tokens live in a
    separate cache), so the returned ban is a full [R, tmax] bool mask."""
    dtype = jnp.dtype(dtype_name)
    R, sx = x.shape
    S, K, P = y_prefix.shape
    pe = ssr_model.sine_table(cfg.max_position, cfg.d_model)

    x_h = ssr_model.embed_text(params, cfg, x, pe)
    y_tok = jnp.swapaxes(y_prefix, 1, 2)  # [S, P, K]
    if aug_text:  # uncond rows reuse their prompt's audio prefix
        y_tok = jnp.concatenate([y_tok, y_tok], axis=0)
    y_h = ssr_model.embed_audio_tokens(params, cfg, y_tok)
    y_h = ssr_model.apply_audio_pos(params, y_h, pe, 0)
    h = jnp.concatenate([x_h, y_h], axis=1).astype(dtype)

    s_tot = sx + P
    idx = jnp.arange(s_tot)
    is_y_col = idx >= sx
    tri = idx[None, :] > idx[:, None]
    struct = jnp.logical_or(tri, (~is_y_col)[:, None] & is_y_col[None, :])
    # per-row dead keys: text padding + prefix tail padding
    p_lens_r = jnp.concatenate([p_lens, p_lens]) if aug_text else p_lens
    dead = ((idx[None, :] >= x_lens[:, None]) & (idx[None, :] < sx)) | (
        idx[None, :] >= sx + p_lens_r[:, None]
    )
    if aug_text and cfg_pretrained:
        uncond = jnp.arange(R) >= S
        dead = dead | (uncond[:, None] & (idx[None, :] >= 1)
                       & (idx[None, :] < sx))
    banned = struct[None] | dead[:, None, :]  # dead keys banned for all queries
    bias = jnp.where(banned, -1e9, 0.0)[:, None, :, :].astype(jnp.float32)

    cache = trf.init_kv_cache(cfg, R, tmax, dtype=dtype)
    _, cache = trf.transformer_prefill(params["decoder"], h, bias, cache, cfg,
                                       dtype=dtype)
    cache = cache._replace(length=jnp.asarray(s_tot, jnp.int32))
    key_banned = jnp.ones((R, tmax), bool)
    key_banned = key_banned.at[:, :s_tot].set(dead)
    return cache, key_banned


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dec", "num_task", "cap_total", "aug_text",
                     "n_prompts", "dtype_name"),
)
def _generate_multi_impl(
    params,
    pfx: trf.KVCache,  # [L, R, H, Tp, Dh]
    key_banned: jnp.ndarray,  # [R, Tp] bool
    rng: jax.Array,
    sentinel_ids: jnp.ndarray,
    x_lens: jnp.ndarray,  # [S] conditional-row text lengths
    p_lens: jnp.ndarray,  # [S] prefix lengths (per-chain audio position base)
    n_tasks: jnp.ndarray,  # [S] per-prompt span counts (<= num_task)
    *,
    cfg: SSRModelConfig,
    dec: DecodeConfig,
    num_task: int,
    cap_total: int,
    aug_text: bool,
    n_prompts: int,
    dtype_name: str = "bfloat16",
):
    """Decode S DIFFERENT prompts concurrently (each with its own CFG pair).

    A serving capability beyond the reference (which is single-sample only,
    models/ssr.py:559): weight reads amortize across utterances. Per-chain
    audio positions, length caps and span state are vectors; chains freeze
    when done. Prompts may have DIFFERENT span counts (``n_tasks``): a chain
    finishes after its own count while others continue toward ``num_task``.
    """
    dtype = jnp.dtype(dtype_name)
    S = n_prompts
    K = cfg.n_codebooks
    ts = cfg.tokens
    pe = ssr_model.sine_table(cfg.max_position, cfg.d_model)
    silence = jnp.asarray(dec.silence_tokens, jnp.int32)
    length_cap = x_lens * dec.length_cap_mult  # [S]
    gen_sizes = trf.cache_stage_sizes(_bucket(cap_total + 8, 128))
    gen0 = trf.init_kv_cache(
        cfg, S * (2 if aug_text else 1), gen_sizes[0], dtype=pfx.k.dtype)
    static_ban = _static_ban(ts)

    def embed_rows(tokens, y_pos):
        embs = params["audio_emb"]
        h = 0.0
        for k in range(cfg.n_codebooks):
            h = h + embs[k][tokens[:, k]]  # [S, D]
        h = h + params["audio_pos_alpha"][0] * pe[jnp.clip(y_pos, 0, pe.shape[0] - 1)]
        if aug_text:
            h = jnp.concatenate([h, h], axis=0)
        return h.astype(dtype)

    def cond_fn(s, size):
        return ((~jnp.all(s.done)) & (jnp.max(s.out_len) < cap_total)
                & (s.cache.length < size))

    def body(s):
        key, k_samp = jax.random.split(s.key)
        h = embed_rows(s.next_tokens, s.y_pos)
        out_h, cache = trf.transformer_decode_step_shared(
            params["decoder"], h, pfx, s.cache, key_banned, cfg,
            n_groups=h.shape[0], dtype=dtype,
        )
        logits = ssr_model.predict_logits(params, out_h)
        lg, num_cfg = _mix_cfg(logits, s, dec, S, aug_text)
        upd = _advance_chains(
            s, lg, k_samp, num_cfg, ts=ts, dec=dec, num_task=num_task,
            length_cap=length_cap, n_tasks=n_tasks,
            sentinel_ids=sentinel_ids, static_ban=static_ban, silence=silence)
        return ChainState(cache=cache, key=key, **upd)

    init = _init_chain_state(gen0, rng, p_lens.astype(jnp.int32), sentinel_ids,
                             S, K, num_task, ts, cap_total)

    final = _staged_while(cond_fn, body, init, gen_sizes, _grow_cache)
    return final.out, final.span_end, final.out_len


def generate_multi(
    params,
    cfg: SSRModelConfig,
    dec: DecodeConfig,
    prompts,  # list of (x [Sx], y [K,T], mask_intervals)
    rng: jax.Array,
    *,
    dtype_name: str = "bfloat16",
    x_bucket: int = 64,
    prefix_bucket: int = 128,
):
    """Decode several DIFFERENT utterances concurrently in one compiled loop
    (a serving capability the single-sample reference lacks). Prompts may mix
    span counts — a 1-span TTS job batches with 3-span edits; chains finish
    after their own span count. Each prompt is ``(x, y, mask)`` or
    ``(x, y, mask, prompt_x, prompt_y)`` — the 5-tuple form enables the
    aug_context prepend for short spans (same semantics as
    :func:`generate`). Returns a list of per-prompt
    (codes, marks, out_intervals, nm_intervals)."""
    ts = cfg.tokens
    K = cfg.n_codebooks
    S = len(prompts)
    built = []
    trims = []
    for p in prompts:
        (x, y, mask), ctx = p[:3], p[3:]
        x = np.asarray(x, np.int32)
        y = np.asarray(y, np.int32)
        x, y, mask, trim = _apply_aug_context(
            dec, x, y, mask, *(ctx if len(ctx) == 2 else (None, None)))
        trims.append(trim)
        prefix, _, num_task, nm = patterns.build_inference_prefix(y, list(mask), ts)
        built.append((x, y, prefix, num_task, nm))
    n_tasks = np.asarray([b[3] for b in built], np.int32)
    num_task = int(n_tasks.max())
    sentinels = np.arange(ts.mts, ts.mts + ts.max_n_spans, dtype=np.int32)

    sx_pad = _bucket(max(max(len(b[0]) for b in built), 1), x_bucket)
    p_pad = _bucket(max(max(b[2].shape[1] for b in built), 1), prefix_bucket)
    cap_total = dec.max_gen_per_span * num_task
    gen_bound = max(
        b[2].shape[1] + min(cap_total,
                            max(len(b[0]) * dec.length_cap_mult
                                - b[2].shape[1], 0) + num_task * (K + 2))
        for b in built)
    _check_positions(cfg, max(sx_pad, p_pad), gen_bound, "generate_multi")

    prefixes = np.full((S, K, p_pad), ts.empty, np.int32)
    p_lens = np.zeros(S, np.int32)
    for i, (x, y, prefix, _, _) in enumerate(built):
        prefixes[i, :, : prefix.shape[1]] = prefix
        p_lens[i] = prefix.shape[1]
    xb, x_lens_r = build_text_rows([b[0] for b in built], sx_pad, cfg, dec,
                                   jax.random.fold_in(rng, 7))
    x_lens = x_lens_r[:S]

    tmax = _bucket(sx_pad + p_pad + 8, 256)
    pfx, key_banned = _prefill_multi_impl(
        params, jnp.asarray(xb), jnp.asarray(prefixes),
        jnp.asarray(x_lens_r), jnp.asarray(p_lens),
        cfg=cfg, tmax=tmax, dtype_name=dtype_name,
        cfg_pretrained=dec.cfg_pretrained, aug_text=dec.aug_text,
    )
    out, span_end, out_len = _generate_multi_impl(
        params, pfx, key_banned, rng, jnp.asarray(sentinels),
        jnp.asarray(x_lens), jnp.asarray(p_lens), jnp.asarray(n_tasks),
        cfg=cfg, dec=dec, num_task=num_task, cap_total=cap_total,
        aug_text=dec.aug_text, n_prompts=S, dtype_name=dtype_name,
    )
    out = np.asarray(out)
    span_end = np.asarray(span_end)

    results = []
    for i, (x, y, prefix, ntask_i, nm) in enumerate(built):
        results.append(_trim_context(
            assemble_result(y, nm, out[i], span_end[i], ntask_i, K), trims[i]))
    return results


def assemble_result(y, nm, out_row, span_end_row, ntask, K):
    """Host post-processing for ONE decoded prompt: split the concatenated
    span stream at ``span_end_row``, revert the delay pattern, strip EOG and
    splice into the source codes (``ops.patterns``). Shared by
    :func:`generate_multi` and the continuous-batching server."""
    gen_spans = []
    start = 0
    for t in range(ntask):
        end = max(int(span_end_row[t]), start)
        span = out_row[:, start:end]
        start = end
        if span.shape[1] >= K:
            gen_spans.append(patterns.revert_delay_pattern(span)[:, :-1])
        else:
            gen_spans.append(np.zeros((K, 0), np.int32))
    codes, marks, out_iv = patterns.splice_generated(y, nm, gen_spans,
                                                     y.shape[1])
    return codes, marks, out_iv, nm
