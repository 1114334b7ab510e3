"""Streaming TTS: yield waveform chunks WHILE the LM decodes.

The reference (and our own offline pipeline) produces audio only after the
full token sequence is generated and decoded — for an 8 s utterance that is
seconds of dead air. This driver composes two existing compiled pieces into
a generator with sub-second time-to-first-audio:

  - the serving chunk (``inference.serve._serve_chunk_impl``) runs the
    compiled decode loop ``chunk_frames`` steps at a time (its online
    admission budget doubles as a streaming cadence);
  - the delay pattern makes tokens final incrementally: after ``n`` raw
    steps, frames ``0 .. n-K`` are fully resolved
    (``revert_delay_pattern``: out[q, t] = raw[q, t+q] — every needed column
    is already sampled and never rewritten), so each LM chunk releases a
    batch of final codec frames;
  - the chunked causal codec decoder (``models.codec.streaming``) turns
    each released frame batch into waveform with carried conv/LSTM state,
    warmed on the prompt codes so the stream equals the offline
    decode-then-crop TTS output exactly.

Frames are re-buffered to a fixed emission size so the codec decode compiles
for ONE chunk shape (plus one final flush shape). Requires a causal codec
(``codec_cfg.seanet.causal``); the LM side needs nothing special.
"""

from __future__ import annotations

from collections import deque
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CodecConfig, DecodeConfig, SSRModelConfig
from ..models.codec import streaming as cstream
from ..ops import patterns
from . import serve as serve_mod


class TTSStreamer:
    """Low-latency TTS: ``stream()`` yields waveform chunks as they become
    final. One instance compiles once per geometry and is reusable across
    utterances."""

    def __init__(
        self,
        lm_params,
        cfg: SSRModelConfig,
        dec: DecodeConfig,
        codec_params,
        codec_cfg: CodecConfig,
        *,
        chunk_frames: int = 25,
        first_chunk_frames: Optional[int] = None,
        sx_pad: int = 128,
        p_pad: int = 512,
        dtype_name: str = "bfloat16",
        codec_dtype=jnp.float32,
    ):
        """``chunk_frames`` is the steady emission cadence;
        ``first_chunk_frames`` (default ``chunk_frames // 2``) is the first
        chunk's size — smaller means earlier first audio at the cost of one
        extra compiled codec shape."""
        if not codec_cfg.seanet.causal:
            raise ValueError("streaming TTS needs a causal codec "
                             "(codec_cfg.seanet.causal=True)")
        self.cfg, self.dec = cfg, dec
        self.codec_params, self.codec_cfg = codec_params, codec_cfg
        self.chunk_frames = chunk_frames
        self.first_chunk_frames = ((chunk_frames // 2 or 1)
                                   if first_chunk_frames is None
                                   else first_chunk_frames)
        self.codec_dtype = codec_dtype
        self._server = serve_mod.ContinuousBatcher(
            lm_params, cfg, dec, 1, sx_pad=sx_pad, p_pad=p_pad, num_task=1,
            dtype_name=dtype_name)

    def stream(self, x, y_prompt, rng: Optional[jax.Array] = None
               ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """TTS from text ids ``x`` and prompt codes ``y_prompt`` [K, T]:
        yields ``(codes_chunk [K, F], wav_chunk [F*hop, channels])`` pairs of
        the GENERATED region only (the TTS crop), ending with one final
        (possibly shorter) flush chunk."""
        srv = self._server
        K = self.cfg.n_codebooks
        F = self.chunk_frames
        F0 = min(self.first_chunk_frames, F)
        y_prompt = np.asarray(y_prompt, np.int32)
        T = y_prompt.shape[1]
        if rng is not None:
            srv.state = srv.state._replace(key=rng)
        srv._fill_slot(0, 0, x, y_prompt, [(T, T)])

        run_lm_chunk = srv._run_chunk

        # the first LM chunk is dispatched BEFORE codec prompt-warming: both
        # queue on the device while the host is still issuing, so the warm
        # decodes ride in the first chunk's shadow. +K steps so the first
        # F0 frames are delay-resolved when the chunk lands.
        run_lm_chunk(F0 + K)
        codec = cstream.StreamingCodec(self.codec_params, self.codec_cfg,
                                       batch=1, dtype=self.codec_dtype)
        # warm the decoder's conv/LSTM state on the prompt (output = the
        # prompt audio, discarded: the offline TTS path crops it the same)
        for s in range(0, T, F):
            codec.decode_chunk(jnp.asarray(y_prompt[None, :, s:s + F]))

        sent = 0  # frames handed to the codec so far
        target = F0  # first emission is smaller: earlier first audio
        lookahead = False
        while True:
            # slice out this chunk's results FIRST: the slice ops enqueue
            # before the next (buffer-donating) chunk, so in-order device
            # execution reads them safely even though the state is reused
            refs = (srv.state.done[0], srv.state.out_len[0], srv.state.out[0])
            if lookahead:
                # pipeline: the NEXT LM chunk runs on device while the host
                # harvests this one and drives the codec — without this the
                # per-chunk host round-trips serialize with decode and cost
                # more than the LM steps themselves (axon latency)
                run_lm_chunk(F)
            done_d, n_d, out_d = jax.device_get(refs)
            done, n = bool(done_d), int(n_d)
            raw = out_d[:, :n]
            frames = (patterns.revert_delay_pattern(raw) if n >= K
                      else np.zeros((K, 0), np.int32))
            if done:
                frames = frames[:, :-1]  # drop the EOG frame (offline parity)
            avail = frames.shape[1] - sent
            # fixed-size emission => few compiled codec-decode shapes
            while avail >= target or (done and avail > 0):
                take = min(target, avail)
                chunk = frames[:, sent:sent + take]
                wav = np.asarray(codec.decode_chunk(jnp.asarray(chunk[None])))
                sent += take
                avail -= take
                target = F
                yield chunk, wav[0]
            if done:
                # a blind-dispatched lookahead chunk (if any) was a no-op:
                # its loop condition is false on a finished chain
                srv._slot_req[0] = None
                srv.state = srv.state._replace(
                    active=srv.state.active.at[0].set(False))
                return
            if not lookahead:
                # first chunk was harvested un-pipelined (earliest possible
                # first audio); start the lookahead from here
                run_lm_chunk(F)
                lookahead = True


class _Lane:
    """Host-side per-slot stream bookkeeping for :class:`StreamingServer`.

    ``queue`` holds codec frames awaiting decode — the prompt codes at fill
    time, then the resolved generated frames as LM chunks land. The decoder
    doesn't distinguish them (state-wise a frame is a frame); ``discard``
    counts the leading frames whose audio belongs to the prompt region and is
    suppressed (the offline TTS path crops the same region)."""

    __slots__ = ("req_idx", "queue", "discard", "resolved", "eos", "codes",
                 "wavs", "first_at")

    def __init__(self, req_idx: int, queue: np.ndarray, discard: int):
        self.req_idx = req_idx
        self.queue = np.asarray(queue, np.int32)
        self.discard = int(discard)
        self.resolved = 0      # generated frames already enqueued
        self.eos = False       # LM finished; flush the queue remainder
        self.codes: List[np.ndarray] = []
        self.wavs: List[np.ndarray] = []
        self.first_at: Optional[float] = None

    @property
    def flushed(self) -> bool:
        return self.eos and self.queue.shape[1] == 0


class StreamingServer:
    """Multi-client streaming TTS: ``n_slots`` concurrent decode lanes, each
    emitting waveform chunks to its own client as the lane's tokens become
    final (the composition of :class:`TTSStreamer`'s incremental release with
    :class:`serve.ContinuousBatcher`'s slot recycling — neither alone gives N
    concurrent clients sub-second first audio).

    All lanes' codec streams advance through ONE batched program
    (:class:`models.codec.streaming.LaneDecoder`) in fixed
    ``first_chunk_frames``-sized steps — per-lane sequential decodes cost a
    host dispatch per lane per chunk and dominated the chunk budget at 8
    lanes (tools/stream_serve_probe.py). A lane's prompt codes and generated
    frames share one decode queue (prompt audio is discarded by frame count),
    so prompt warm-up needs no extra compiled shapes and overlaps the other
    lanes' steady emission; within a server loop iteration every pending step
    is dispatched back-to-back before the first output is fetched, so the
    decodes pipeline on the device. Only the final flush pads (to the one
    compiled shape) — the polluted state dies with the lane (reset on
    refill).

    Under greedy sampling each client's concatenated stream equals the
    offline generate -> causal decode -> crop pipeline exactly
    (``tests/test_stream_tts.py::test_streaming_server_matches_offline``).
    """

    def __init__(
        self,
        lm_params,
        cfg: SSRModelConfig,
        dec: DecodeConfig,
        codec_params,
        codec_cfg: CodecConfig,
        n_slots: int,
        *,
        chunk_frames: int = 25,
        first_chunk_frames: Optional[int] = None,
        sx_pad: int = 128,
        p_pad: int = 512,
        dtype_name: str = "bfloat16",
        codec_dtype=jnp.float32,
        warm_chunk: int = 50,
    ):
        if not codec_cfg.seanet.causal:
            raise ValueError("streaming TTS needs a causal codec "
                             "(codec_cfg.seanet.causal=True)")
        if chunk_frames <= 2 * cfg.n_codebooks:
            # a fresh lane resolves chunk_frames - K frames per LM chunk; the
            # first emission (chunk_frames // 2) must be covered by one chunk
            raise ValueError(
                f"chunk_frames={chunk_frames} too small vs the delay pattern "
                f"(need > 2*K = {2 * cfg.n_codebooks})")
        self.cfg, self.dec = cfg, dec
        self.codec_params, self.codec_cfg = codec_params, codec_cfg
        self.chunk_frames = chunk_frames
        # emission granularity == the batched codec step size
        self.first_chunk_frames = ((chunk_frames // 2 or 1)
                                   if first_chunk_frames is None
                                   else first_chunk_frames)
        self.warm_chunk = warm_chunk
        self._lane_codec = cstream.LaneDecoder(codec_params, codec_cfg,
                                               n_slots, dtype=codec_dtype)
        self._server = serve_mod.ContinuousBatcher(
            lm_params, cfg, dec, n_slots, sx_pad=sx_pad, p_pad=p_pad,
            num_task=1, dtype_name=dtype_name)

    # ------------------------------------------------------------- internals

    def _drain(self, lanes: List[Optional[_Lane]], now_fn, on_chunk) -> None:
        """Advance the batched codec until no lane has a full step pending
        (EOS remainders flush padded). All steps are dispatched before the
        first output is fetched — they pipeline on the device — then fetched
        in order so emission timestamps track actual availability."""
        f = self.first_chunk_frames
        hop = self.codec_cfg.hop_length
        K = self.cfg.n_codebooks
        S = len(lanes)
        plan = []   # per step: list of (slot, emitted codes, skip, take)
        outs = []
        while True:
            steps = []
            codes = np.zeros((S, K, f), np.int32)
            active = np.zeros((S,), bool)
            for slot, lane in enumerate(lanes):
                if lane is None:
                    continue
                pending = lane.queue.shape[1]
                if pending >= f:
                    take = f
                elif lane.eos and pending > 0:
                    take = pending
                else:
                    continue
                chunk = lane.queue[:, :take]
                if take < f:  # final flush: pad to the compiled shape
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[:, -1:], f - take, axis=1)],
                        axis=1)
                codes[slot] = chunk
                active[slot] = True
                skip = min(lane.discard, take)
                steps.append((slot, chunk[:, skip:take], skip, take))
                lane.queue = lane.queue[:, take:]
                lane.discard -= skip
            if not steps:
                break
            outs.append(self._lane_codec.step(codes, active))
            plan.append(steps)
        for steps, out in zip(plan, outs):
            if all(take - skip <= 0 for _, _, skip, take in steps):
                continue  # prompt-region only: nothing to emit, skip the fetch
            wav = jax.device_get(out)
            now = now_fn()
            for slot, c_emit, skip, take in steps:
                if take - skip <= 0:
                    continue  # still inside the prompt region
                lane = lanes[slot]
                w = wav[slot][skip * hop: take * hop]
                if lane.first_at is None:
                    lane.first_at = now
                lane.codes.append(c_emit)
                lane.wavs.append(w)
                if on_chunk is not None:
                    on_chunk(lane.req_idx, c_emit, w, now)

    # ------------------------------------------------------------------- API

    def projected_prompt_frames(self, wav) -> int:
        """Frame count :meth:`encode_prompt` will produce for ``wav`` — the
        pad-to-hop tokenizer contract. Admission-time geometry checks MUST
        use this so fill-time cannot see a different shape."""
        n = np.asarray(wav).reshape(-1).shape[0]
        return max(1, -(-n // self.codec_cfg.hop_length))

    def encode_prompt(self, wav, bucket_frames: int = 150) -> np.ndarray:
        """Encode a raw prompt waveform (mono float [-1, 1], codec sample
        rate) to codec tokens [K, F] on the device — for transports whose
        clients send audio rather than codes (e.g. the HTTP server's
        ``prompt_wav``). Frame count follows the pad-to-hop tokenizer
        contract (``data/tokenizer.py::AudioTokenizer.encode``); the wav is
        padded up to ``bucket_frames`` multiples so compiles stay bounded
        (trailing frames are trimmed). MUST be called from the thread that
        drives :meth:`serve_loop` — one thread programs the TPU."""
        from ..models.codec import wmencodec as wm

        wav = np.asarray(wav, np.float32).reshape(-1)
        hop = self.codec_cfg.hop_length
        frames = self.projected_prompt_frames(wav)
        # coarse buckets (default 3 s) keep the compile count low; callers
        # can pre-warm the first bucket before serving (the engine thread
        # otherwise stalls all lanes on a new-shape compile)
        bucket = -(-frames // bucket_frames) * bucket_frames
        padded = np.zeros((1, bucket * hop, 1), np.float32)
        padded[0, : len(wav), 0] = wav
        codes, _, _ = wm.encode(self.codec_params, jnp.asarray(padded),
                                self.codec_cfg)
        return np.asarray(codes)[0, :, :frames]

    def prepare_request(self, x, y_prompt) -> Tuple:
        """Normalize + validate one TTS request (text ids, prompt codes
        [K, T] — T may be 0). Raises on geometry violations; returns the
        opaque prepared tuple :meth:`serve_loop`'s ``poll`` must supply —
        callers (e.g. the HTTP server) validate at ADMISSION time so a bad
        request is rejected up front instead of killing the serving loop."""
        y_prompt = np.asarray(y_prompt, np.int32)
        T = y_prompt.shape[1]
        x = np.asarray(x, np.int32)
        pre = self._server.validate_request(x, y_prompt, [(T, T)])
        return (x, y_prompt, [(T, T)], pre)

    def serve_loop(
        self,
        poll,
        on_chunk=None,
        on_done=None,
        rng: Optional[jax.Array] = None,
        clock=None,
        should_stop=None,
        on_idle=None,
        eager_prefill: int = 1,
    ):
        """Open-ended serving engine: pull requests forever, stream chunks.

        ``poll()`` → ``(req_id, prepared)`` with ``prepared`` from
        :meth:`prepare_request`, or ``None`` when nothing is pending right
        now (with ``eager_prefill`` > 0 — the default — it may be called
        while every lane is busy, to prefill the next request behind the
        in-flight chunk; a polled request is committed and served FIFO).
        ``on_chunk(req_id,
        codes [K,f], wav [f*hop, ch], t)`` fires per emitted chunk;
        ``on_done(req_id, codes [K,T], wav, first_at, t)`` fires once per
        request with the concatenated stream (``t``/``first_at`` are seconds
        on ``clock`` since loop start). The loop returns when
        ``should_stop()`` is true and every lane is idle (default: runs
        until all work is drained and ``poll`` keeps returning None —
        suitable only when the caller stops it; pass ``should_stop``).
        ``on_idle(now)`` is called when no lane is active and poll returned
        None (default: 5 ms sleep) — give it a blocking wait to avoid
        spinning. ``run_online`` is this loop driven by an arrival schedule.
        """
        import time as _time

        srv = self._server
        clock = clock or _time.monotonic
        if rng is not None:
            srv.state = srv.state._replace(key=rng)
        S = srv.S
        K = self.cfg.n_codebooks
        F = self.chunk_frames
        if should_stop is None:
            should_stop = lambda: False
        if on_idle is None:
            on_idle = lambda now: _time.sleep(0.005)
        t0 = clock()
        lanes: List[Optional[_Lane]] = [None] * S
        # eager prefill: requests polled + prefilled behind an in-flight LM
        # chunk, so a freed lane pays only the splice (``poll`` may thus be
        # called while every lane is busy; a staged request is committed to
        # this engine and is filled FIFO before newly polled ones)
        staged: deque = deque()  # (req_id, _prefill_request result, y_prompt)

        def stage_pending():
            while len(staged) < eager_prefill:
                item = poll()
                if item is None:
                    return
                req_id, (x, y_prompt, mask, pre) = item
                staged.append(
                    (req_id, srv._prefill_request(x, y_prompt, mask, pre=pre),
                     y_prompt))

        def fill_free_lanes():
            reset_mask = np.zeros((S,), bool)
            warms = []
            for slot in range(S):
                if lanes[slot] is not None:
                    continue
                if staged:
                    req_id, st, y_prompt = staged.popleft()
                else:
                    item = poll()
                    if item is None:
                        break
                    req_id, (x, y_prompt, mask, pre) = item
                    st = srv._prefill_request(x, y_prompt, mask, pre=pre)
                srv._splice_slot(slot, req_id, st)
                warms.append((slot, req_id, y_prompt))
                reset_mask[slot] = True
            if reset_mask.any():
                self._lane_codec.reset(reset_mask)
            for slot, req_id, y_prompt in warms:
                # prompt bulk at batch=1 + state scatter; the (< warm chunk)
                # remainder merges into the step queue
                consumed = self._lane_codec.warm_lane(slot, y_prompt,
                                                      self.warm_chunk)
                lanes[slot] = _Lane(req_id, y_prompt[:, consumed:],
                                    y_prompt.shape[1] - consumed)

        while True:
            fill_free_lanes()
            if not any(l is not None for l in lanes):
                if should_stop():
                    return
                on_idle(clock() - t0)
                continue
            # snapshot THEN dispatch: the copies enqueue before the
            # (state-donating) LM chunk, so in-order device execution reads
            # them safely while the next chunk already decodes
            refs = (jnp.copy(srv.state.done), jnp.copy(srv.state.out_len),
                    jnp.copy(srv.state.out))
            srv._run_chunk(F)
            if eager_prefill:
                # the LM chunk occupies the device: prefill the next pending
                # request(s) now — host prep + device prefill hide behind it
                stage_pending()
            done_h, len_h, out_h = jax.device_get(refs)
            for slot in range(S):
                lane = lanes[slot]
                if lane is None or lane.eos:
                    continue
                n = int(len_h[slot])
                done = bool(done_h[slot])
                raw = out_h[slot][:, :n]
                frames = (patterns.revert_delay_pattern(raw) if n >= K
                          else np.zeros((K, 0), np.int32))
                if done:
                    frames = frames[:, :-1]  # drop EOG (offline parity)
                    lane.eos = True
                new = frames[:, lane.resolved:]
                if new.shape[1]:
                    lane.queue = np.concatenate([lane.queue, new], axis=1)
                    lane.resolved = frames.shape[1]
            self._drain(lanes, lambda: clock() - t0, on_chunk)
            now = clock() - t0
            for slot in range(S):
                lane = lanes[slot]
                if lane is None or not lane.flushed:
                    continue
                # the LM chunk just dispatched above no-ops for this lane (a
                # harvestable lane falsifies its loop condition) — one idle
                # dispatch per finish, then the lane refills next iteration
                codes = (np.concatenate(lane.codes, axis=1) if lane.codes
                         else np.zeros((K, 0), np.int32))
                wav = (np.concatenate(lane.wavs, axis=0) if lane.wavs
                       else np.zeros((0, 1), np.float32))
                if on_done is not None:
                    on_done(lane.req_idx, codes, wav, lane.first_at, now)
                lanes[slot] = None
                srv._slot_req[slot] = None
                srv.state = srv.state._replace(
                    active=srv.state.active.at[slot].set(False))

    def run_online(
        self,
        requests: Sequence[Tuple],
        arrival_times: Sequence[float],
        on_chunk=None,
        rng: Optional[jax.Array] = None,
        clock=None,
        eager_prefill: int = 1,
    ):
        """Serve TTS requests (each ``(x, y_prompt)``) arriving at
        ``arrival_times`` seconds after the call; each request's waveform is
        streamed through ``on_chunk(req_idx, codes [K,f], wav [f*hop, ch],
        t)`` as it becomes final (``t`` = seconds since call, the emission
        time on the arrival clock; ``f`` = ``first_chunk_frames``, the
        emission granularity — boundary chunks may be shorter).

        Returns ``(results, first_chunk_at, done_at)``: ``results[i]`` is the
        concatenated ``(codes [K,T], wav [T*hop, ch])`` of the generated
        region, ``first_chunk_at[i]`` the first-audio emission time (TTFA =
        ``first_chunk_at[i] - arrival_times[i]``), ``done_at[i]`` the final
        chunk's emission time. ``clock`` is injectable for tests.
        """
        import time as _time

        clock = clock or _time.monotonic
        # fail fast on EVERY request before any decoding
        norm = [self.prepare_request(x, y) for x, y in requests]
        order = sorted(range(len(requests)), key=lambda i: arrival_times[i])
        pending = deque((i, norm[i]) for i in order)
        results: List = [None] * len(requests)
        first_at: List = [None] * len(requests)
        done_at: List = [None] * len(requests)
        t0 = [None]  # serve_loop's clock origin (its first clock() call)

        def poll():
            if t0[0] is None:
                t0[0] = clock()
            if not pending:
                return None
            idx, prepared = pending[0]
            if arrival_times[idx] > clock() - t0[0]:
                return None  # FIFO: head hasn't arrived yet
            pending.popleft()
            return idx, prepared

        def on_idle(now):
            if pending:  # idle until the next arrival
                wait = arrival_times[pending[0][0]] - now
                if wait > 0:
                    _time.sleep(wait)

        def on_done(idx, codes, wav, first, t):
            results[idx] = (codes, wav)
            first_at[idx] = first
            done_at[idx] = t

        # clock origin: serve_loop calls clock() once at entry, before poll
        def loop_clock():
            now = clock()
            if t0[0] is None:
                t0[0] = now
            return now

        self.serve_loop(
            poll, on_chunk=on_chunk, on_done=on_done, rng=rng,
            clock=loop_clock,
            should_stop=lambda: not pending,
            on_idle=on_idle,
            eager_prefill=eager_prefill,
        )
        return results, first_at, done_at
