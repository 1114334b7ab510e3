"""Continuous-batching TTS/edit serving for the SSR LM on TPU.

The static multi-prompt loop (:func:`inference.decode.generate_multi`) batches
S utterances but holds every slot until the LAST chain finishes — with mixed
output lengths the tail straggler idles most of the batch. This driver keeps
the decode loop saturated instead (the vLLM-style continuous batching the
torch reference — single-sample host-driven decode, ``models/ssr.py:646-771``
— has no analogue of):

  - a compiled chunk (``lax.while_loop``) decodes S slots and EXITS as soon
    as any live chain finishes;
  - the host harvests finished slots, prefills the next queued request and
    splices it into the SAME state (pfx-cache rows, per-slot bookkeeping)
    without touching the other mid-flight chains;
  - the generated-KV cache uses PER-ROW write columns
    (:func:`models.transformer.transformer_decode_step_paged`): a refilled
    slot restarts at column 0 of its own row, so cache memory is bounded per
    request and the server runs indefinitely with no compaction. Column
    indices carry no positional meaning (sine PE is added at embed time from
    the chain's own ``y_pos``), which is what makes row reuse sound.

Every jitted program has static shapes (S slots, padded text/prefix buckets,
fixed per-request generation cap): one compile per server geometry, reused
across the whole request stream. Under greedy sampling, served outputs are
bit-identical to single-prompt :func:`decode.generate`
(``tests/test_serving.py``).
"""

from __future__ import annotations

import functools
from collections import deque
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DecodeConfig, SSRModelConfig
from ..models import ssr as ssr_model
from ..models import transformer as trf
from ..ops import patterns
from . import decode as dec_mod


class ServeState(NamedTuple):
    """Vectorized per-slot chain state (fields as ``_generate_multi_impl``)
    plus the paged-cache column pointers and slot occupancy."""

    cache: trf.KVCache  # generated KV, [L, R, H, G, Dh], per-row columns
    key: jax.Array
    y_pos: jnp.ndarray  # [S]
    next_tokens: jnp.ndarray  # [S, K]
    out: jnp.ndarray  # [S, K, cap_total]
    out_len: jnp.ndarray  # [S]
    span_idx: jnp.ndarray
    span_end: jnp.ndarray  # [S, num_task]
    num_gen: jnp.ndarray
    num_eog: jnp.ndarray
    prev_token: jnp.ndarray
    consec_silence: jnp.ndarray
    num_cfg: jnp.ndarray
    done: jnp.ndarray  # [S] chain finished (or slot parked)
    gen_len: jnp.ndarray  # [R] per-ROW gen-cache write column
    active: jnp.ndarray  # [S] slot holds a live (unharvested) request
    steps: jnp.ndarray  # scalar: steps taken THIS chunk (admission budget)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dec", "num_task", "cap_total", "aug_text",
                     "n_slots", "dtype_name"),
    donate_argnames=("state",),
)
def _serve_chunk_impl(
    params,
    pfx: trf.KVCache,  # [L, R, H, Tp, Dh]
    key_banned: jnp.ndarray,  # [R, Tp] bool
    state: ServeState,
    x_lens: jnp.ndarray,  # [S]
    n_tasks: jnp.ndarray,  # [S]
    sentinel_ids: jnp.ndarray,  # [num_task]
    step_budget: jnp.ndarray,  # scalar: max steps this chunk (traced)
    *,
    cfg: SSRModelConfig,
    dec: DecodeConfig,
    num_task: int,
    cap_total: int,
    aug_text: bool,
    n_slots: int,
    dtype_name: str = "bfloat16",
) -> ServeState:
    """Decode until any live chain finishes, the step budget runs out, or
    no live chains remain. The budget bounds ONLINE admission latency: the
    host re-enters with arrivals spliced in at most ``step_budget`` steps
    after they land (offline callers pass a huge budget).

    The loop body is the multi-prompt step (shared ``_advance_chains`` state
    machine + CFG mix) over the paged decode step; parked slots
    (``active=False``) ride along frozen at zero marginal cost beyond their
    static batch row. The gen cache is read at full capacity every step;
    a host-staged read-length telescope was tried and measured SLOWER (the
    static window slice materializes as a copy — see
    ``transformer_decode_step_paged``), and row recycling already bounds the
    buffer at one request's generation cap."""
    dtype = jnp.dtype(dtype_name)
    S = n_slots
    ts = cfg.tokens
    pe = ssr_model.sine_table(cfg.max_position, cfg.d_model)
    silence = jnp.asarray(dec.silence_tokens, jnp.int32)
    length_cap = x_lens * dec.length_cap_mult
    static_ban = dec_mod._static_ban(ts)

    def embed_rows(tokens, y_pos):
        embs = params["audio_emb"]
        h = 0.0
        for k in range(cfg.n_codebooks):
            h = h + embs[k][tokens[:, k]]
        h = h + params["audio_pos_alpha"][0] * pe[jnp.clip(y_pos, 0, pe.shape[0] - 1)]
        if aug_text:
            h = jnp.concatenate([h, h], axis=0)
        return h.astype(dtype)

    def cond_fn(s):
        live = s.active & ~s.done
        harvestable = s.active & s.done
        return (jnp.any(live) & ~jnp.any(harvestable)
                & (s.steps < step_budget))

    def body(s):
        key, k_samp = jax.random.split(s.key)
        adv = s.active & ~s.done  # rows that consume a cache column this step
        h = embed_rows(s.next_tokens, s.y_pos)
        out_h, cache = trf.transformer_decode_step_paged(
            params["decoder"], h, pfx, s.cache, key_banned, s.gen_len, cfg,
            dtype=dtype,
        )
        logits = ssr_model.predict_logits(params, out_h)
        lg, num_cfg = dec_mod._mix_cfg(logits, s, dec, S, aug_text)
        upd = dec_mod._advance_chains(
            s, lg, k_samp, num_cfg, ts=ts, dec=dec, num_task=num_task,
            length_cap=length_cap, n_tasks=n_tasks,
            sentinel_ids=sentinel_ids, static_ban=static_ban, silence=silence)
        adv_r = jnp.concatenate([adv, adv]) if aug_text else adv
        gen_len = jnp.where(adv_r, s.gen_len + 1, s.gen_len)
        return ServeState(cache=cache, key=key, gen_len=gen_len,
                          active=s.active, steps=s.steps + 1, **upd)

    return jax.lax.while_loop(cond_fn, body, state)


@functools.partial(
    jax.jit, static_argnames=("aug_text", "n_slots"),
    donate_argnames=("state", "pfx", "key_banned", "x_lens", "n_tasks"),
)
def _refill_impl(
    state: ServeState,
    pfx: trf.KVCache,
    key_banned: jnp.ndarray,
    x_lens: jnp.ndarray,
    n_tasks: jnp.ndarray,
    slot: jnp.ndarray,  # scalar int32 (traced: no recompile per slot)
    new_pfx: trf.KVCache,  # [L, 1 or 2, H, Tp, Dh] rows for the new request
    new_banned: jnp.ndarray,  # [1 or 2, Tp]
    x_len: jnp.ndarray,
    p_len: jnp.ndarray,
    n_task_new: jnp.ndarray,
    sentinel0: jnp.ndarray,
    empty_tok: jnp.ndarray,
    *,
    aug_text: bool,
    n_slots: int,
):
    """Splice a freshly-prefilled request into slot ``slot`` of a running
    server state; every other slot's rows are untouched (buffers donated, so
    the updates are in-place on device)."""
    S = n_slots
    K = state.next_tokens.shape[1]

    k = jax.lax.dynamic_update_index_in_dim(pfx.k, new_pfx.k[:, 0], slot, 1)
    v = jax.lax.dynamic_update_index_in_dim(pfx.v, new_pfx.v[:, 0], slot, 1)
    key_banned = jax.lax.dynamic_update_index_in_dim(
        key_banned, new_banned[0], slot, 0)
    gen_len = state.gen_len.at[slot].set(0)
    if aug_text:
        k = jax.lax.dynamic_update_index_in_dim(k, new_pfx.k[:, 1], S + slot, 1)
        v = jax.lax.dynamic_update_index_in_dim(v, new_pfx.v[:, 1], S + slot, 1)
        key_banned = jax.lax.dynamic_update_index_in_dim(
            key_banned, new_banned[1], S + slot, 0)
        gen_len = gen_len.at[S + slot].set(0)
    pfx = trf.KVCache(k, v, pfx.length)

    state = state._replace(
        y_pos=state.y_pos.at[slot].set(p_len),
        next_tokens=state.next_tokens.at[slot].set(
            jnp.broadcast_to(sentinel0, (K,))),
        out=state.out.at[slot].set(empty_tok),
        out_len=state.out_len.at[slot].set(0),
        span_idx=state.span_idx.at[slot].set(0),
        span_end=state.span_end.at[slot].set(0),
        num_gen=state.num_gen.at[slot].set(0),
        num_eog=state.num_eog.at[slot].set(0),
        prev_token=state.prev_token.at[slot].set(-1),
        consec_silence=state.consec_silence.at[slot].set(0),
        num_cfg=state.num_cfg.at[slot].set(1),
        done=state.done.at[slot].set(False),
        gen_len=gen_len,
        active=state.active.at[slot].set(True),
    )
    return state, pfx, key_banned, x_lens.at[slot].set(x_len), \
        n_tasks.at[slot].set(n_task_new)


class ContinuousBatcher:
    """Slot-recycling server over a fixed geometry.

    One instance compiles three programs — single-request prefill, the serve
    chunk, the refill splice — and then streams any number of requests
    through ``n_slots`` concurrent decode lanes. Geometry (text/prefix pad
    buckets, max span count, per-request generation cap) is fixed at
    construction; requests beyond it are rejected rather than silently
    recompiled.
    """

    def __init__(
        self,
        params,
        cfg: SSRModelConfig,
        dec: DecodeConfig,
        n_slots: int,
        *,
        sx_pad: int = 128,
        p_pad: int = 512,
        num_task: int = 1,
        dtype_name: str = "bfloat16",
    ):
        self.params = params
        self.cfg, self.dec = cfg, dec
        self.S = n_slots
        self.sx_pad, self.p_pad = sx_pad, p_pad
        self.num_task = num_task
        self.cap_total = dec.max_gen_per_span * num_task
        self.dtype_name = dtype_name
        self.aug = dec.aug_text
        self.tmax = dec_mod._bucket(sx_pad + p_pad + 8, 256)
        ts = cfg.tokens
        self.sentinels = np.arange(ts.mts, ts.mts + ts.max_n_spans,
                                   dtype=np.int32)[:max(num_task, 1)]
        self._sentinels_dev = jnp.asarray(self.sentinels)
        R = n_slots * (2 if self.aug else 1)
        gen_cap = dec_mod._bucket(self.cap_total + 8, 128)
        dtype = jnp.dtype(dtype_name)
        self._pfx = trf.init_kv_cache(cfg, R, self.tmax, dtype=dtype)
        self._pfx = self._pfx._replace(
            length=jnp.asarray(sx_pad + p_pad, jnp.int32))
        self._banned = jnp.ones((R, self.tmax), bool)
        self._x_lens = jnp.ones((n_slots,), jnp.int32)
        self._n_tasks = jnp.ones((n_slots,), jnp.int32)
        self.state = ServeState(
            cache=trf.init_kv_cache(cfg, R, gen_cap, dtype=dtype),
            key=jax.random.PRNGKey(0),
            y_pos=jnp.zeros((n_slots,), jnp.int32),
            next_tokens=jnp.full((n_slots, cfg.n_codebooks), ts.empty,
                                 jnp.int32),
            out=jnp.full((n_slots, cfg.n_codebooks, self.cap_total), ts.empty,
                         jnp.int32),
            out_len=jnp.zeros((n_slots,), jnp.int32),
            span_idx=jnp.zeros((n_slots,), jnp.int32),
            span_end=jnp.zeros((n_slots, num_task), jnp.int32),
            num_gen=jnp.zeros((n_slots,), jnp.int32),
            num_eog=jnp.zeros((n_slots,), jnp.int32),
            prev_token=jnp.full((n_slots,), -1, jnp.int32),
            consec_silence=jnp.zeros((n_slots,), jnp.int32),
            num_cfg=jnp.ones((n_slots,), jnp.int32),
            done=jnp.ones((n_slots,), bool),  # empty slots look finished...
            gen_len=jnp.zeros((R,), jnp.int32),
            active=jnp.zeros((n_slots,), bool),  # ...but hold no request
            steps=jnp.zeros((), jnp.int32),
        )
        # host-side per-slot request records for harvest
        self._slot_req: List[Optional[dict]] = [None] * n_slots
        # stream for cfg_pretrained=False random-uncond rows (fresh draw per
        # prefill, like the reference samples per run)
        self._uncond_key = jax.random.PRNGKey(7)
        self._n_prefills = 0

    # ------------------------------------------------------------- internals

    def _normalize(self, req):
        """Unpack a request — ``(x, y, mask)`` or, with aug_context prompts,
        ``(x, y, mask, prompt_x, prompt_y)`` — and apply the short-span
        context prepend. Returns (x, y, mask, trim_frames); ``trim`` is
        carried in the slot meta and stripped at harvest."""
        x, y, mask = req[:3]
        ctx = req[3:]
        return dec_mod._apply_aug_context(
            self.dec, np.asarray(x, np.int32), np.asarray(y, np.int32),
            list(mask), *(ctx if len(ctx) == 2 else (None, None)))

    def validate_request(self, x, y, mask):
        """Raise (geometry / span count) BEFORE any decoding: a failure
        mid-run would abandon in-flight lanes and drop finished results.
        Expects NORMALIZED inputs (:meth:`_normalize` already applied).
        Returns (x, y, prefix, ntask, nm) for reuse."""
        cfg, dec, ts = self.cfg, self.dec, self.cfg.tokens
        x = np.asarray(x, np.int32)
        y = np.asarray(y, np.int32)
        # token-range checks: out-of-range ids from an external client would
        # otherwise silently clip in jnp embedding lookups (or crash a codec
        # warm-decode mid-run, killing every in-flight lane)
        if x.size and (x.min() < 0 or x.max() >= cfg.text_vocab_size):
            raise ValueError(
                f"text ids out of range [0, {cfg.text_vocab_size})")
        if y.size and (y.min() < 0 or y.max() >= ts.audio_vocab_size):
            raise ValueError(
                f"audio codes out of range [0, {ts.audio_vocab_size})")
        prefix, _, ntask, nm = patterns.build_inference_prefix(
            y, list(mask), ts)
        if len(x) > self.sx_pad or prefix.shape[1] > self.p_pad:
            raise ValueError(
                f"request exceeds server geometry: text {len(x)}/{self.sx_pad}"
                f" prefix {prefix.shape[1]}/{self.p_pad}")
        if ntask > self.num_task:
            raise ValueError(f"request has {ntask} spans > {self.num_task}")
        return x, y, prefix, ntask, nm

    def _prefill_request(self, x, y, mask, pre=None):
        """Pad + prefill ONE request; returns (pfx rows, banned rows, meta).
        ``pre``: a saved :meth:`validate_request` result — callers that
        already validated (run/run_online fail-fast loops) pass it so the
        prefix isn't rebuilt a third time."""
        cfg, dec, ts = self.cfg, self.dec, self.cfg.tokens
        K = cfg.n_codebooks
        x, y, prefix, ntask, nm = (self.validate_request(x, y, mask)
                                   if pre is None else pre)
        pfx_row = np.full((1, K, self.p_pad), ts.empty, np.int32)
        pfx_row[0, :, : prefix.shape[1]] = prefix
        self._n_prefills += 1
        xb, x_lens_r = dec_mod.build_text_rows(
            [x], self.sx_pad, cfg, dec,
            jax.random.fold_in(self._uncond_key, self._n_prefills))
        new_pfx, new_banned = dec_mod._prefill_multi_impl(
            self.params, jnp.asarray(xb), jnp.asarray(pfx_row),
            jnp.asarray(x_lens_r), jnp.asarray([prefix.shape[1]], np.int32),
            cfg=cfg, tmax=self.tmax, dtype_name=self.dtype_name,
            cfg_pretrained=dec.cfg_pretrained, aug_text=self.aug,
        )
        meta = dict(y=y, nm=nm, ntask=ntask, x_len=len(x),
                    p_len=prefix.shape[1])
        return new_pfx, new_banned, meta

    def _fill_slot(self, slot: int, req_idx: int, x, y, mask, trim: int = 0,
                   pre=None):
        self._splice_slot(slot, req_idx,
                          self._prefill_request(x, y, mask, pre=pre),
                          trim=trim)

    def _splice_slot(self, slot: int, req_idx: int, staged, trim: int = 0):
        """Splice an already-prefilled request (``staged`` =
        :meth:`_prefill_request`'s result) into a free lane. Splitting
        prefill from splice lets the serving loops run the prefill EAGERLY —
        dispatched behind the in-flight decode chunk, where its host prep and
        device time hide — so a freed lane pays only this sub-ms donated
        update before the next chunk dispatches (the measured ~7 ms lane
        refill, BENCHMARKS.md "Online serving")."""
        new_pfx, new_banned, meta = staged
        meta["req_idx"] = req_idx
        meta["trim"] = trim
        self._slot_req[slot] = meta
        ts = self.cfg.tokens
        (self.state, self._pfx, self._banned, self._x_lens,
         self._n_tasks) = _refill_impl(
            self.state, self._pfx, self._banned, self._x_lens, self._n_tasks,
            jnp.asarray(slot, jnp.int32), new_pfx, new_banned,
            jnp.asarray(meta["x_len"], jnp.int32),
            jnp.asarray(meta["p_len"], jnp.int32),
            jnp.asarray(meta["ntask"], jnp.int32),
            jnp.asarray(self.sentinels[0], jnp.int32),
            jnp.asarray(ts.empty, jnp.int32),
            aug_text=self.aug, n_slots=self.S,
        )

    def _run_chunk(self, step_budget: int):
        """Reset the admission counter and dispatch one compiled serve
        chunk (the ONLY call site of ``_serve_chunk_impl`` — run(),
        run_online() and the TTS streamer all pace through here)."""
        self.state = self.state._replace(steps=jnp.zeros((), jnp.int32))
        self.state = _serve_chunk_impl(
            self.params, self._pfx, self._banned, self.state,
            self._x_lens, self._n_tasks, self._sentinels_dev,
            jnp.asarray(step_budget, jnp.int32),
            cfg=self.cfg, dec=self.dec, num_task=self.num_task,
            cap_total=self.cap_total, aug_text=self.aug, n_slots=self.S,
            dtype_name=self.dtype_name,
        )

    def _harvest_slot(self, slot: int):
        meta = self._slot_req[slot]
        out_row = np.asarray(self.state.out[slot])
        span_end_row = np.asarray(self.state.span_end[slot])
        self._slot_req[slot] = None
        result = dec_mod._trim_context(dec_mod.assemble_result(
            meta["y"], meta["nm"], out_row, span_end_row, meta["ntask"],
            self.cfg.n_codebooks), meta.get("trim", 0))
        return meta["req_idx"], result

    # ------------------------------------------------------------------- API

    def run(self, requests: Sequence[Tuple], rng: Optional[jax.Array] = None,
            progress=None, eager_prefill: int = 1):
        """Serve ``requests`` (each ``(x, y, mask_intervals)``, the
        :func:`decode.generate` contract) FIFO through the slot pool; returns
        results in request order (each ``(codes, marks, out_intervals, nm)``).
        ``progress``: optional callable(completed, total, steps).
        ``eager_prefill``: how many pending requests to prefill behind each
        in-flight chunk (0 disables; fill order — and thus greedy results —
        is FIFO either way)."""
        if rng is not None:
            self.state = self.state._replace(key=rng)
        norm = [self._normalize(r) for r in requests]
        # fail fast, before any decoding; the validated tuples (prefix etc.)
        # are reused at fill time instead of being rebuilt per slot
        vals = [self.validate_request(x, y, mask) for x, y, mask, _ in norm]
        pending = deque(zip(range(len(norm)), norm, vals))
        staged: deque = deque()  # (idx, _prefill_request result, trim)
        results: List = [None] * len(requests)
        n_done = 0

        def next_fill(slot: int) -> None:
            if staged:
                nidx, st, trim = staged.popleft()
                self._splice_slot(slot, nidx, st, trim=trim)
            else:
                nidx, (x, y, mask, trim), pre = pending.popleft()
                self._fill_slot(slot, nidx, x, y, mask, trim, pre=pre)

        for slot in range(self.S):
            if not pending:
                break
            next_fill(slot)
        while True:
            self._run_chunk(2**30)
            # the chunk runs until a lane finishes; prefill the next
            # request(s) NOW so the freed lane pays only the splice
            while pending and len(staged) < eager_prefill:
                nidx, (x, y, mask, trim), pre = pending.popleft()
                staged.append(
                    (nidx, self._prefill_request(x, y, mask, pre=pre), trim))
            harvestable = np.asarray(self.state.active & self.state.done)
            if not harvestable.any():
                break
            for slot in np.nonzero(harvestable)[0]:
                idx, result = self._harvest_slot(int(slot))
                results[idx] = result
                n_done += 1
                if staged or pending:
                    next_fill(int(slot))
                else:
                    self.state = self.state._replace(
                        active=self.state.active.at[int(slot)].set(False))
            if progress is not None:
                progress(n_done, len(requests),
                         int(np.max(np.asarray(self.state.gen_len))))
        return results


    def run_online(self, requests: Sequence[Tuple], arrival_times,
                   rng: Optional[jax.Array] = None, clock=None,
                   chunk_steps: int = 64, eager_prefill: int = 1):
        """Serve requests that ARRIVE OVER TIME (the regime this server is
        for): each request becomes eligible at ``arrival_times[i]`` seconds
        after the call and is spliced into the first free lane — no batch
        collection delay, and a long chain never holds finished results.

        Returns (results, completion_times) with completion measured on the
        same clock as arrivals. ``clock`` (default ``time.monotonic``) is
        injectable for tests. Offline workloads (everything available at
        t=0) should instead use ``decode.generate_multi`` over
        :func:`sorted_static_batches` batches — the static loop's
        telescoping caches win on pure throughput (tools/serve_probe.py)."""
        import time as _time

        clock = clock or _time.monotonic
        if rng is not None:
            self.state = self.state._replace(key=rng)
        norm = [self._normalize(r) for r in requests]
        # fail fast, before any decoding; validated tuples reused at fill
        vals = [self.validate_request(x, y, mask) for x, y, mask, _ in norm]
        t0 = clock()
        order = sorted(range(len(requests)), key=lambda i: arrival_times[i])
        pending = deque((i, norm[i], vals[i]) for i in order)
        staged: deque = deque()  # (idx, _prefill_request result, trim)
        results: List = [None] * len(requests)
        done_at = [None] * len(requests)

        def fill_free_slots():
            # occupy every inactive lane: staged (already prefilled) first,
            # then arrived pending requests — FIFO either way
            active = np.array(self.state.active)  # mutable host copy
            for slot in range(self.S):
                if active[slot]:
                    continue
                if staged:
                    idx, st, trim = staged.popleft()
                    self._splice_slot(slot, idx, st, trim=trim)
                elif pending and arrival_times[pending[0][0]] <= clock() - t0:
                    idx, req, pre = pending.popleft()
                    self._fill_slot(slot, idx, *req, pre=pre)
                else:
                    break  # FIFO: head hasn't arrived yet (or nothing left)
                active[slot] = True

        while pending or staged or np.asarray(self.state.active).any():
            if (not np.asarray(self.state.active).any() and not staged
                    and pending):
                # idle: sleep until the next arrival
                wait = arrival_times[pending[0][0]] - (clock() - t0)
                if wait > 0:
                    _time.sleep(wait)
            fill_free_slots()
            self._run_chunk(chunk_steps)
            # eager prefill: while the chunk decodes, prefill the next
            # ARRIVED request(s) so a lane freed at harvest pays only the
            # splice before the next chunk (not the ~7 ms prefill)
            while (pending and len(staged) < eager_prefill
                   and arrival_times[pending[0][0]] <= clock() - t0):
                idx, (x, y, mask, trim), pre = pending.popleft()
                staged.append(
                    (idx, self._prefill_request(x, y, mask, pre=pre), trim))
            harvestable = np.asarray(self.state.active & self.state.done)
            now = clock() - t0
            for slot in np.nonzero(harvestable)[0]:
                idx, result = self._harvest_slot(int(slot))
                results[idx] = result
                done_at[idx] = now
                self.state = self.state._replace(
                    active=self.state.active.at[int(slot)].set(False))
        return results, done_at


def sorted_static_batches(requests, n_slots: int,
                          est_len=None) -> List[List[int]]:
    """Offline-throughput scheduling for the STATIC multi-prompt loop
    (``decode.generate_multi``): order requests by expected output length and
    batch neighbours, so each batch's straggler is barely longer than its
    mean (classic shortest-processing-time batching). Returns request-index
    batches; ``est_len(request)`` defaults to the text length (output length
    is capped at ``x_len * length_cap_mult``, so text length is the natural
    proxy). For ONLINE serving use :class:`ContinuousBatcher` instead."""
    if est_len is None:
        est_len = lambda r: len(r[0])
    order = sorted(range(len(requests)), key=lambda i: est_len(requests[i]))
    return [order[i:i + n_slots] for i in range(0, len(order), n_slots)]


def serve_requests(params, cfg, dec, requests, rng=None, *, n_slots=8,
                   x_bucket=64, prefix_bucket=128, dtype_name="bfloat16"):
    """One-shot convenience: size a :class:`ContinuousBatcher` to the
    workload (pad buckets from the largest request) and run it."""
    ts = cfg.tokens
    sx_max, p_max, nt_max = 1, 1, 1
    for req in requests:
        # geometry must be sized AFTER the aug_context prepend (requests may
        # be 5-tuples carrying prompt context — see ContinuousBatcher._normalize)
        x, y, mask = req[:3]
        ctx = req[3:]
        x, y, mask, _ = dec_mod._apply_aug_context(
            dec, np.asarray(x, np.int32), np.asarray(y, np.int32), list(mask),
            *(ctx if len(ctx) == 2 else (None, None)))
        prefix, _, ntask, _ = patterns.build_inference_prefix(y, list(mask), ts)
        sx_max = max(sx_max, len(x))
        p_max = max(p_max, prefix.shape[1])
        nt_max = max(nt_max, ntask)
    server = ContinuousBatcher(
        params, cfg, dec, min(n_slots, len(requests)),
        sx_pad=dec_mod._bucket(sx_max, x_bucket),
        p_pad=dec_mod._bucket(p_max, prefix_bucket),
        num_task=nt_max, dtype_name=dtype_name)
    return server.run(requests, rng)
