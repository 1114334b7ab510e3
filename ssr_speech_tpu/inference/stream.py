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

from typing import Iterator, Optional, Tuple

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
