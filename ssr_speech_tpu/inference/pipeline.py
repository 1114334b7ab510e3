"""End-to-end inference: text+audio -> edited / synthesized waveform.

Capability parity with reference ``inference_scale.py`` and the
``inference_v2.py`` orchestration:
  - phonemize target (and prompt) text -> ids, dropping OOV phones
    (inference_scale.py:20-34),
  - codec-encode source audio (inference_scale.py:36-39),
  - LM span-infilling generation (inference_scale.py:43-59 ->
    ``inference.decode.generate``),
  - watermark decode: rebuild the waveform with original samples copied into
    un-edited regions and the watermark embedded in generated regions
    (inference_scale.py:66-80), or plain codec decode (:83),
  - TTS crop after the prompt (inference_scale.py:85-86),
  - word-span -> time interval -> codec-frame mask_interval conversion
    (inference_v2.py:131-157,288-326) with sub_amount morphing and
    span combining.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..config import CodecConfig, DecodeConfig, SSRModelConfig
from ..data.tokenizer import AudioTokenizer, TextTokenizer, tokenize_text
from . import decode as decode_mod

logger = logging.getLogger(__name__)

Span = Tuple[int, int]
WordTime = Tuple[str, float, float]  # word, start sec, end sec


def text_to_ids(tokenizer: TextTokenizer, phn2num: Dict[str, int], text: str) -> np.ndarray:
    """Phonemize and map to ids, dropping OOV phones like the reference
    (inference_scale.py:20-34) — but hard-fail when most phones are OOV:
    that means the tokenizer's phone alphabet does not match the bundle's
    ``phn2num`` (typically the char fallback running against a real
    espeak-trained checkpoint), which would silently produce garbage audio."""
    phones = tokenize_text(tokenizer, text)
    toks = [phn2num[p] for p in phones if p in phn2num]
    if phones and len(toks) < 0.5 * len(phones):
        hint = (" The espeak phonemizer is unavailable and the char fallback "
                "is active — install espeak-ng/phonemizer to match this "
                "bundle." if getattr(tokenizer, "backend", None) is None
                else "")
        raise RuntimeError(
            f"{len(phones) - len(toks)}/{len(phones)} phones missing from the "
            f"bundle's phn2num — tokenizer/bundle mismatch.{hint}"
        )
    return np.asarray(toks, np.int32)


def word_span_to_time(words: Sequence[WordTime], span: Span) -> Tuple[float, float]:
    """Word-index span -> (start_sec, end_sec) using alignment times
    (reference inference_v2.py:131-157 / inference_scale.py:92-115)."""
    s, e = span
    n = len(words)
    assert 0 <= s <= e <= n, (s, e, n)
    if e == 0:  # insert at the very beginning
        return 0.0, float(words[0][1])
    if s == n:  # append at the end
        t = float(words[-1][2])
        return t, t
    if s == e:  # pure insertion between words
        return float(words[s - 1][2]), float(words[s][1])
    start = float(words[s - 1][2]) if s > 0 else float(words[s][1])
    end = float(words[e][1]) if e < n else float(words[-1][2])
    return start, end


def spans_to_mask_intervals(
    words: Sequence[WordTime],
    spans: Sequence[Span],
    audio_dur: float,
    codec_sr: int = 50,
    sub_amount: float = 0.12,
) -> List[Span]:
    """Morph +-sub_amount, clamp, combine, convert to codec frames
    (reference inference_v2.py:297-326)."""
    intervals = []
    for sp in spans:
        s, e = word_span_to_time(words, sp)
        s = max(s - sub_amount, 0.0)
        e = min(e + sub_amount, audio_dur)
        intervals.append((s, e))
    # combine overlapping
    combined: List[Tuple[float, float]] = []
    for s, e in sorted(intervals):
        if combined and s <= combined[-1][1]:
            combined[-1] = (combined[-1][0], max(combined[-1][1], e))
        else:
            combined.append((s, e))
    return [
        (int(round(s * codec_sr)), int(round(e * codec_sr))) for s, e in combined
    ]


def inference_one_sample(
    lm_params,
    cfg: SSRModelConfig,
    dec: DecodeConfig,
    phn2num: Dict[str, int],
    text_tokenizer: TextTokenizer,
    audio_tokenizer: AudioTokenizer,
    audio_path: str,
    prompt_text: str,
    target_text: str,
    mask_interval: Sequence[Span],
    use_watermark: bool = True,
    tts: bool = False,
    seed: int = 1,
) -> np.ndarray:
    """Returns generated waveform [1, T, 1] float32
    (reference inference_scale.py:17-88)."""
    from ..utils import audio as audio_io

    x = text_to_ids(text_tokenizer, phn2num, target_text)
    prompt_x = text_to_ids(text_tokenizer, phn2num, prompt_text) if prompt_text else np.zeros(0, np.int32)

    codes, scale, _, wav = _encode(audio_tokenizer, audio_path)
    y = codes[0]  # [K, F]
    logger.info("source audio: %d codec frames (%.2f s)", y.shape[1],
                y.shape[1] / dec.codec_sr)

    # aug_context: the reference feeds the ORIGINAL codes as the context
    # audio too (inference_scale.py:43-49 passes original_audio twice), so
    # prompt_y = y; decode.generate activates the prepend only when the
    # masked span is short (< 2 s) and trims it from the outputs
    out_codes, marks, out_intervals, nm = decode_mod.generate(
        lm_params, cfg, dec, x, y, list(mask_interval), jax.random.PRNGKey(seed),
        prompt_x=prompt_x, prompt_y=y,
    )
    logger.info("generated %d codec frames (%.2f s)", out_codes.shape[2],
                out_codes.shape[2] / dec.codec_sr)

    hop = audio_tokenizer.cfg.hop_length
    if use_watermark:
        # copy original samples into un-edited regions, zeros elsewhere,
        # then let the watermark decoder fuse them (inference_scale.py:66-80)
        new_wav = np.zeros((1, out_codes.shape[2] * hop, 1), np.float32)
        for (os_, oe), (ns, ne) in zip(nm, out_intervals):
            os_, ns = max(os_, 0), max(ns, 0)
            seg = wav[0, os_ * hop:oe * hop]
            new_wav[0, ns * hop:ns * hop + seg.shape[0]] = seg
        out = audio_tokenizer.wmdecode(out_codes, marks, new_wav, scale)
    else:
        out = audio_tokenizer.decode(out_codes, scale)

    if tts:
        out = out[:, out_intervals[0][1] * hop:]
    return out


def _encode(audio_tokenizer: AudioTokenizer, audio_path: str):
    from ..data.tokenizer import tokenize_audio

    return tokenize_audio(audio_tokenizer, audio_path)


def inference_batch(
    lm_params,
    cfg: SSRModelConfig,
    dec: DecodeConfig,
    phn2num: Dict[str, int],
    text_tokenizer: TextTokenizer,
    audio_tokenizer: AudioTokenizer,
    audio_path: str,
    target_text: str,
    mask_interval: Sequence[Span],
    n_samples: int,
    use_watermark: bool = True,
    tts: bool = False,
    seed: int = 1,
) -> List[np.ndarray]:
    """Decode ``n_samples`` seeds of the same prompt in ONE compiled loop
    (replaces the reference's sequential per-seed decodes,
    inference_v2.py:331-337). Returns a list of waveforms [1, T, 1]."""
    x = text_to_ids(text_tokenizer, phn2num, target_text)
    codes, scale, _, wav = _encode(audio_tokenizer, audio_path)
    y = codes[0]
    results = decode_mod.generate_batch(
        lm_params, cfg, dec, x, y, list(mask_interval),
        jax.random.PRNGKey(seed), n_samples,
    )
    hop = audio_tokenizer.cfg.hop_length
    outs = []
    for out_codes, marks, out_intervals, nm in results:
        if use_watermark:
            new_wav = np.zeros((1, out_codes.shape[2] * hop, 1), np.float32)
            for (os_, oe), (ns, ne) in zip(nm, out_intervals):
                os_, ns = max(os_, 0), max(ns, 0)
                seg = wav[0, os_ * hop:oe * hop]
                new_wav[0, ns * hop:ns * hop + seg.shape[0]] = seg
            out = audio_tokenizer.wmdecode(out_codes, marks, new_wav, scale)
        else:
            out = audio_tokenizer.decode(out_codes, scale)
        if tts:
            out = out[:, out_intervals[0][1] * hop:]
        outs.append(out)
    return outs


def inference_multi(
    lm_params,
    cfg: SSRModelConfig,
    dec: DecodeConfig,
    phn2num: Dict[str, int],
    text_tokenizer: TextTokenizer,
    audio_tokenizer: AudioTokenizer,
    jobs: Sequence[Dict],
    use_watermark: bool = True,
    seed: int = 1,
    continuous: bool = False,
    n_slots: int = 8,
) -> List[np.ndarray]:
    """Serve several different utterances in ONE compiled decode loop
    (capability beyond the single-sample reference). Each job:
    {audio_path, target_text, mask_interval, tts?}. All jobs must share the
    span count. Returns waveforms in job order.

    continuous=True streams the jobs through the slot-recycling
    continuous-batching server (``inference.serve``) instead of one static
    batch: finished lanes refill from the queue immediately, so mixed-length
    workloads larger than ``n_slots`` keep the chip saturated."""
    prompts = []
    metas = []
    for job in jobs:
        x = text_to_ids(text_tokenizer, phn2num, job["target_text"])
        codes, scale, _, wav = _encode(audio_tokenizer, job["audio_path"])
        prompts.append((x, codes[0], list(job["mask_interval"])))
        metas.append((wav, bool(job.get("tts", False)), scale))
    if continuous:
        from . import serve as serve_mod

        results = serve_mod.serve_requests(
            lm_params, cfg, dec, prompts, jax.random.PRNGKey(seed),
            n_slots=n_slots)
    elif len(prompts) > n_slots:
        # offline throughput: shortest-job static batches (each batch's
        # straggler ~ its mean; serve.sorted_static_batches)
        from . import serve as serve_mod

        results = [None] * len(prompts)
        for batch in serve_mod.sorted_static_batches(prompts, n_slots):
            outs = decode_mod.generate_multi(
                lm_params, cfg, dec, [prompts[i] for i in batch],
                jax.random.PRNGKey(seed))
            for i, r in zip(batch, outs):
                results[i] = r
    else:
        results = decode_mod.generate_multi(
            lm_params, cfg, dec, prompts, jax.random.PRNGKey(seed)
        )
    hop = audio_tokenizer.cfg.hop_length
    outs = []
    for (wav, tts, scale), (out_codes, marks, out_iv, nm) in zip(metas,
                                                                 results):
        if use_watermark:
            new_wav = np.zeros((1, out_codes.shape[2] * hop, 1), np.float32)
            for (os_, oe), (ns, ne) in zip(nm, out_iv):
                os_, ns = max(os_, 0), max(ns, 0)
                seg = wav[0, os_ * hop:oe * hop]
                new_wav[0, ns * hop:ns * hop + seg.shape[0]] = seg
            out = audio_tokenizer.wmdecode(out_codes, marks, new_wav, scale)
        else:
            out = audio_tokenizer.decode(out_codes, scale)
        if tts:
            out = out[:, out_iv[0][1] * hop:]
        outs.append(out)
    return outs


def tts_trim_offset(
    gen_words: Sequence[WordTime], first_target_word: str, language: str = "en"
) -> float:
    """Where to cut the leading prompt out of a TTS result, from a
    re-transcription of the generated audio (reference
    inference_v2.py:338-354): if the first recognized word already is the
    first target word, trim at its start; otherwise assume one residual
    prompt word and trim at the second word's start."""
    if not gen_words:
        return 0.0
    w0 = gen_words[0][0]
    tgt = first_target_word
    if language == "en":
        w0, tgt = w0.lower(), tgt.lower()
    if w0.strip(".,!?'\" ") == tgt.strip(".,!?'\" "):
        return float(gen_words[0][1])
    if len(gen_words) > 1:
        return float(gen_words[1][1])
    return float(gen_words[0][1])


def cut_prompt_for_tts(
    words: Sequence[WordTime], prompt_length: float
) -> Tuple[int, float]:
    """Find the word boundary closest under ``prompt_length`` seconds
    (reference inference_v2.py:240-254). Returns (n_prompt_words, cut_sec)."""
    n = 0
    cut = 0.0
    for i, (_, s, e) in enumerate(words):
        if e > prompt_length:
            break
        n = i + 1
        cut = float(e)
    if n == 0 and words:
        n, cut = 1, float(words[0][2])
    return n, cut
