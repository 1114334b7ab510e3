"""Host frontend tokenizers: phonemizer (espeak) text tokenizer with a
dependency-gated fallback, and the codec audio tokenizer facade.

Capability parity with reference ``data/tokenizer.py``:
  - TextTokenizer: espeak backend with punctuation preservation and
    word/phone separators, phone-list splitting (tokenizer.py:31-97). When
    the ``phonemizer`` package / espeak-ng library is unavailable (it is an
    external host dependency, SURVEY §2.6), a deterministic character-level
    fallback keeps the pipeline runnable; production deployments install
    espeak exactly as the reference requires (README.md:37,56).
  - AudioTokenizer: encode/decode/wmdecode/detect_watermark over the JAX
    wmencodec (tokenizer.py:99-159), including the pad-to-hop handling of
    ``tokenize_audio`` (tokenizer.py:141-159).
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..config import CodecConfig
from ..models.codec import wmencodec as wm
from ..utils import audio as audio_io

logger = logging.getLogger(__name__)

try:  # host-side C dependency, optional in this environment
    from phonemizer.backend import EspeakBackend
    from phonemizer.punctuation import Punctuation
    from phonemizer.separator import Separator

    HAVE_PHONEMIZER = True
except Exception:  # pragma: no cover - environment without espeak
    HAVE_PHONEMIZER = False


class TextTokenizer:
    """Text -> phone list. espeak-backed when available, else char fallback."""

    def __init__(
        self,
        language: str = "en-us",
        backend: str = "espeak",
        preserve_punctuation: bool = True,
        with_stress: bool = False,
    ):
        self.language = language
        self.word_sep = "_"
        self.phone_sep = "|"
        if HAVE_PHONEMIZER and backend == "espeak":
            self.backend = EspeakBackend(
                language,
                punctuation_marks=Punctuation.default_marks(),
                preserve_punctuation=preserve_punctuation,
                with_stress=with_stress,
                tie=False,
                language_switch="keep-flags",
                words_mismatch="ignore",
            )
            self.separator = Separator(word=self.word_sep, syllable="-",
                                       phone=self.phone_sep)
        else:
            self.backend = None
            logger.warning(
                "phonemizer/espeak unavailable; using character fallback "
                "tokenizer (install espeak-ng for reference-equivalent "
                "phonemization)"
            )

    def _to_list(self, phonemized: str) -> List[str]:
        fields: List[str] = []
        for word in phonemized.split(self.word_sep):
            parts = re.findall(r"\w+|[^\w\s]", word, re.UNICODE)
            fields.extend([p for p in parts if p != self.phone_sep])
            fields.append(self.word_sep)
        return fields[:-1]

    def __call__(self, text: str) -> List[str]:
        text = text.strip()
        if self.backend is not None:
            out = self.backend.phonemize(
                [text], separator=self.separator, strip=True, njobs=1
            )[0]
            return self._to_list(out)
        # fallback: characters with word separators — keeps ids stable
        fields: List[str] = []
        for word in text.split():
            fields.extend(list(word))
            fields.append(self.word_sep)
        return fields[:-1] if fields else []


def tokenize_text(tokenizer: TextTokenizer, text: str) -> List[str]:
    return tokenizer(text.strip())


class AudioTokenizer:
    """Codec facade over the JAX wmencodec (reference tokenizer.py:99-138)."""

    def __init__(self, params: Dict[str, Any], cfg: Optional[CodecConfig] = None):
        self.params = params
        self.cfg = cfg or CodecConfig()

    @property
    def sample_rate(self) -> int:
        return self.cfg.sample_rate

    def encode(self, wav: np.ndarray):
        """wav [B, T, C] -> (codes [B, K, F], scale [B, 1] or None, latents)
        — the reference tokenizer contract (tokenizer.py:125-127); scale is
        None unless ``cfg.renormalize``."""
        codes, scale, emb = wm.encode(self.params, wav, self.cfg)
        return (np.asarray(codes),
                None if scale is None else np.asarray(scale),
                np.asarray(emb))

    def decode(self, codes: np.ndarray,
               scale: Optional[np.ndarray] = None) -> np.ndarray:
        return np.asarray(wm.decode(self.params, codes, self.cfg, scale))

    def wmdecode(self, codes: np.ndarray, marks: np.ndarray,
                 wav: np.ndarray,
                 scale: Optional[np.ndarray] = None) -> np.ndarray:
        out, _ = wm.wmdecode(self.params, codes, marks, wav, self.cfg, scale)
        return np.asarray(out)

    def detect_watermark(self, wav: np.ndarray) -> np.ndarray:
        return np.asarray(wm.detect_watermark(self.params, wav, self.cfg))


def tokenize_audio(tokenizer: AudioTokenizer, path: str):
    """Load, pad to hop multiple, resample, encode
    (reference tokenizer.py:141-159, which returns (frames, scale, emb);
    the loaded waveform is appended for the splice paths)."""
    wav = audio_io.load_for_codec(path, tokenizer.sample_rate,
                                  tokenizer.cfg.hop_length)
    codes, scale, emb = tokenizer.encode(wav)
    return codes, scale, emb, wav
