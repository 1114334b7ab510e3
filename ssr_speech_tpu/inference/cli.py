"""Inference CLI: zero-shot speech editing and TTS.

Mirrors the reference ``inference_v2.py`` argparse surface (:158-188):
``--tts --language --aug_text --aug_context --cfg_coef --cfg_stride
--use_watermark --sub_amount --prompt_length --top_k --top_p --temperature
--stop_repetition --seed ...``.

ASR + forced alignment (whisperx in the reference, inference_v2.py:56-94) is
a host-side preprocessing step (SURVEY §2.6): provide it either through the
gated ``utils.asr`` transformers-Whisper wrapper or precomputed with
``--alignment_file`` (CSV ``word,start,end`` rows). Everything downstream —
span diff, mask intervals, LM generation, watermark decode — runs here.
"""

from __future__ import annotations

import argparse
import csv
import logging
import time
from typing import List, Tuple


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="SSR-Speech TPU inference")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--sub_amount", type=float, default=0.12,
                   help="seconds to add around each edit span")
    p.add_argument("--codec_sr", type=int, default=50)
    p.add_argument("--codec_audio_sr", type=int, default=None,
                   help="output wav header rate (reference "
                        "inference_v2.py:161,337 labels the save with this "
                        "value); default: the codec bundle's sample rate")
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--top_p", type=float, default=0.8)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--stop_repetition", type=int, default=2)
    p.add_argument("--kvcache", type=int, default=1)
    p.add_argument("--silence_tokens", type=int, nargs="*",
                   default=[1388, 1898, 131])
    p.add_argument("--cfg_coef", type=float, default=1.5)
    p.add_argument("--cfg_stride", type=int, default=5)
    p.add_argument("--aug_text", action="store_true")
    p.add_argument("--aug_context", action="store_true")
    p.add_argument("--cfg_pretrained", action="store_true")
    p.add_argument("--use_watermark", action="store_true")
    p.add_argument("--tts", action="store_true")
    p.add_argument("--language", type=str, default="en", choices=["en", "zh"])
    p.add_argument("--model_path", type=str, required=True,
                   help="LM bundle (.pkl from our trainer or .pth reference bundle)")
    p.add_argument("--codec_path", type=str, required=True,
                   help="wmencodec checkpoint (.pkl ours or .th reference)")
    p.add_argument("--orig_audio", type=str, required=True)
    p.add_argument("--orig_transcript", type=str, default=None)
    p.add_argument("--target_transcript", type=str, required=True)
    p.add_argument("--alignment_file", type=str, default=None,
                   help="CSV word,start,end (skips ASR)")
    p.add_argument("--temp_folder", type=str, default="./temp",
                   help="accepted for reference-CLI compatibility; this "
                        "implementation keeps everything in memory")
    p.add_argument("--output_dir", type=str, default="./out")
    p.add_argument("--savename", type=str, default="output")
    p.add_argument("--whisper_model", type=str, default=None,
                   help="HF whisper id for on-host ASR+alignment")
    p.add_argument("--whisper_model_name", type=str, default=None,
                   choices=["base.en", "base"],
                   help="reference-CLI spelling (inference_v2.py:186): "
                        "short OpenAI model name, mapped to the HF id "
                        "openai/whisper-<name>")
    p.add_argument("--align_model", type=str, default=None,
                   help="HF wav2vec2-CTC id for forced alignment of the "
                        "transcript (the whisperx-style pass, reference "
                        "inference_v2.py:56-94; more accurate word bounds "
                        "than Whisper timestamps)")
    p.add_argument("--prompt_length", type=float, default=3.0)
    p.add_argument("--sample_batch_size", type=int, default=1)
    return p


def read_alignment(path: str) -> List[Tuple[str, float, float]]:
    words = []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0] in ("word", "BEGIN"):
                continue
            words.append((row[0], float(row[1]), float(row[2])))
    return words


def load_lm(path: str):
    """Load an LM bundle: ours (.pkl), the reference's torch bundle, a URL,
    or a HF hub id (``models.pretrained``)."""
    from ..models import pretrained

    return pretrained.load_lm(path)


def load_codec(path: str):
    from ..models import pretrained

    return pretrained.load_codec(path)


def resolve_alignment(orig_audio, orig_transcript, *, alignment_file=None,
                      align_model=None, whisper_model=None):
    """Word alignment [(word, start, end)] from one of: a precomputed CSV, a
    wav2vec2 forced aligner over the known transcript (whisperx-equivalent),
    or transformers-Whisper ASR (optionally re-aligned)."""
    if alignment_file:
        return read_alignment(alignment_file)
    if align_model and orig_transcript:
        from ..utils.forced_align import Wav2Vec2Aligner

        return Wav2Vec2Aligner(align_model).align(orig_audio, orig_transcript)
    if whisper_model:
        from ..utils.asr import WhisperAligner

        words = WhisperAligner(whisper_model).transcribe(orig_audio)
        if align_model:  # re-align the ASR transcript with wav2vec2
            from ..utils.forced_align import Wav2Vec2Aligner

            words = Wav2Vec2Aligner(align_model).align(
                orig_audio, " ".join(w for w, _, _ in words))
        return words
    raise SystemExit("need --alignment_file, --align_model with "
                     "--orig_transcript, or --whisper_model")


def prepare_job(words, orig_transcript, target_transcript, audio_dur, *,
                language="en", tts=False, codec_sr=50, sub_amount=0.12,
                prompt_length=3.0):
    """Host preprocessing for one utterance: text normalization, edit-span
    diff and codec-frame mask intervals. Returns
    (orig_transcript, target_transcript, target_text, mask_intervals) —
    ``target_transcript`` is the digit-normalized (and zh-simplified) edit
    text alone; ``target_text`` is what the LM consumes (for TTS the prompt
    transcript is prepended)."""
    from ..utils.text_norm import (normalize_aligned_words,
                                   replace_numbers_with_words)
    from . import edit as edit_mod
    from . import pipeline

    # digits -> spelled-out words on the alignment AND both transcripts:
    # phonemizing "42" vs "forty-two" changes the token stream (the reference
    # normalizes every ASR segment, inference_v2.py:45-53,90-94)
    words = normalize_aligned_words(words)
    target_transcript = replace_numbers_with_words(target_transcript)
    if orig_transcript:
        orig_transcript = replace_numbers_with_words(orig_transcript)
    orig_transcript = orig_transcript or " ".join(w for w, _, _ in words)
    if language == "zh":
        try:  # traditional -> simplified, reference inference_v2.py:114-122
            from opencc import OpenCC  # host-side optional dep

            cc = OpenCC("t2s")
            orig_transcript = cc.convert(orig_transcript)
            target_transcript = cc.convert(target_transcript)
        except ImportError:
            logging.warning("opencc unavailable; skipping t2s conversion")

    # --- edit spans -> codec-frame mask intervals ---
    if language == "zh":
        parse = edit_mod.parse_tts_zh if tts else edit_mod.parse_edit_zh
    else:
        parse = edit_mod.parse_tts_en if tts else edit_mod.parse_edit_en
    spans = parse(orig_transcript, target_transcript)
    if tts:
        target_text = orig_transcript + " " + target_transcript \
            if language == "en" else orig_transcript + target_transcript
        _, cut = pipeline.cut_prompt_for_tts(words, prompt_length)
        # TTS masks from the prompt boundary to audio end (the reference cuts
        # the audio at the prompt and masks pure future, inference_v2.py:324)
        mask_intervals = [(int(cut * codec_sr), int(audio_dur * codec_sr))]
    else:
        target_text = target_transcript
        mask_intervals = pipeline.spans_to_mask_intervals(
            words, spans, audio_dur, codec_sr, sub_amount
        )
    return orig_transcript, target_transcript, target_text, mask_intervals


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    t0 = time.time()

    from ..config import DecodeConfig
    from ..data.tokenizer import TextTokenizer
    from ..utils import audio as audio_io
    from . import pipeline

    params, cfg, phn2num = load_lm(args.model_path)
    audio_tok = load_codec(args.codec_path)
    lang = "cmn" if args.language == "zh" else "en-us"
    text_tok = TextTokenizer(language=lang)

    import os

    if not os.path.isfile(args.orig_audio):
        raise SystemExit(f"--orig_audio not found: {args.orig_audio}")

    words = resolve_alignment(
        args.orig_audio, args.orig_transcript,
        alignment_file=args.alignment_file, align_model=args.align_model,
        whisper_model=args.whisper_model)

    wav, sr = audio_io.read_wav(args.orig_audio)
    audio_dur = wav.shape[-1] / sr

    orig_transcript, args.target_transcript, target_text, mask_intervals = \
        prepare_job(
            words, args.orig_transcript, args.target_transcript, audio_dur,
            language=args.language, tts=args.tts, codec_sr=args.codec_sr,
            sub_amount=args.sub_amount, prompt_length=args.prompt_length)
    logging.info("mask intervals (codec frames): %s", mask_intervals)

    dec = DecodeConfig(
        top_k=args.top_k, top_p=args.top_p, temperature=args.temperature,
        stop_repetition=args.stop_repetition, kvcache=bool(args.kvcache),
        silence_tokens=tuple(args.silence_tokens), cfg_coef=args.cfg_coef,
        cfg_stride=args.cfg_stride, aug_text=args.aug_text,
        aug_context=args.aug_context, cfg_pretrained=args.cfg_pretrained,
        codec_sr=args.codec_sr, seed=args.seed,
    )

    os.makedirs(args.output_dir, exist_ok=True)
    # reference-CLI aliases
    if args.whisper_model_name and not args.whisper_model:
        args.whisper_model = f"openai/whisper-{args.whisper_model_name}"
    out_sr = args.codec_audio_sr or audio_tok.sample_rate
    if out_sr != audio_tok.sample_rate:
        logging.warning("--codec_audio_sr %d != codec sample rate %d: the "
                        "wav header is labeled %d (reference behavior, no "
                        "resample)", out_sr, audio_tok.sample_rate, out_sr)
    if args.sample_batch_size > 1:
        # all seeds decoded in one compiled loop (vs the reference's
        # sequential per-seed decodes, inference_v2.py:331-337)
        outs = pipeline.inference_batch(
            params, cfg, dec, phn2num, text_tok, audio_tok,
            args.orig_audio, target_text, mask_intervals,
            n_samples=args.sample_batch_size,
            use_watermark=args.use_watermark, tts=args.tts, seed=args.seed,
        )
        for i, out in enumerate(outs):
            audio_io.write_wav(
                os.path.join(args.output_dir, f"{args.savename}_seed{args.seed + i}.wav"),
                out[0, :, 0], out_sr)
    else:
        out = pipeline.inference_one_sample(
            params, cfg, dec, phn2num, text_tok, audio_tok,
            args.orig_audio, orig_transcript, target_text, mask_intervals,
            use_watermark=args.use_watermark, tts=args.tts, seed=args.seed,
        )
        out_path = os.path.join(args.output_dir, f"{args.savename}.wav")
        audio_io.write_wav(out_path, out[0, :, 0], out_sr)
        if args.tts and args.whisper_model:
            # trim residual prompt audio via re-transcription
            # (reference inference_v2.py:338-354)
            from ..utils.asr import WhisperAligner

            gen_words = WhisperAligner(args.whisper_model).transcribe(out_path)
            first_target = (args.target_transcript.split() or [""])[0] \
                if args.language == "en" else args.target_transcript[:1]
            offset = pipeline.tts_trim_offset(gen_words, first_target,
                                              args.language)
            if offset > 0:
                cut = int(offset * audio_tok.sample_rate)
                audio_io.write_wav(out_path, out[0, cut:, 0], out_sr)
    logging.info("Running time: %.2f s", time.time() - t0)


if __name__ == "__main__":
    main()
