"""Host-side ASR + word-level alignment via transformers Whisper (gated).

The reference uses whisperx / faster-whisper (ctranslate2) for transcription
and forced alignment (``inference_v2.py:56-94``). Those native deps are not
vendored; this wrapper produces the same ``[(word, start, end)]`` contract
with HuggingFace transformers' Whisper word timestamps when a model is
available locally. Anything that produces that contract (whisperx offline,
MFA, manual CSV) plugs into the CLI via ``--alignment_file``.
"""

from __future__ import annotations

from typing import List, Tuple

WordTime = Tuple[str, float, float]


class WhisperAligner:
    def __init__(self, model_id: str, device: str = "cpu", language: str = "en"):
        from transformers import pipeline  # gated heavyweight import

        self.pipe = pipeline(
            "automatic-speech-recognition",
            model=model_id,
            device=device,
            return_timestamps="word",
        )
        self.language = language

    def transcribe(self, audio_path: str) -> List[WordTime]:
        from . import audio as audio_io

        wav, sr = audio_io.read_wav(audio_path)
        mono = wav.mean(axis=0)
        out = self.pipe({"raw": mono, "sampling_rate": sr})
        words: List[WordTime] = []
        for chunk in out.get("chunks", []):
            s, e = chunk["timestamp"]
            words.append((chunk["text"].strip(), float(s), float(e if e is not None else s)))
        return words
