"""Raw-audio segment dataset for codec training.

Capability parity with ``audiocraft/audiocraft/data/audio_dataset.py``
(AudioDataset): a jsonl manifest of AudioMeta lines ``{"path", "duration",
"sample_rate"}`` (the reference's ``makefile.py:8-41`` writes
``egs/train/data.jsonl``), random fixed-duration segment sampling (config
``dataset.segment_duration: 2``), mono conversion + resample, short-file
padding. Batches come out at one static shape so the codec GAN step compiles
once.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..config import CodecConfig
from ..utils import audio as audio_io

logger = logging.getLogger(__name__)


class AudioSegmentDataset:
    def __init__(
        self,
        manifest: str,
        cfg: CodecConfig,
        segment_duration: float = 2.0,
        seed: int = 0,
        min_audio_duration: float = 0.1,
        loader_threads: int = 0,
    ):
        """loader_threads > 0 routes batch loading through the C++ threaded
        WAV loader (``native.load_wav_batch``: parallel parse + mono-mix +
        crop; rows needing resample or exotic encodings fall back to the
        python path per-row)."""
        self.cfg = cfg
        self.loader_threads = loader_threads
        self.segment_samples = int(segment_duration * cfg.sample_rate)
        # round to a hop multiple so codec frames line up
        hop = cfg.hop_length
        self.segment_samples = (self.segment_samples // hop) * hop
        self.metas: List[Dict] = []
        with open(manifest) as f:
            for line in f:
                if not line.strip():
                    continue
                m = json.loads(line)
                if m.get("duration", segment_duration) >= min_audio_duration:
                    self.metas.append(m)
        logger.info("audio dataset: %d files", len(self.metas))
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.metas)

    def sample_segment(self, idx: Optional[int] = None) -> np.ndarray:
        """Random segment [T] float32 (pad with zeros when too short,
        reference audio_dataset.py segment sampling)."""
        if idx is None:
            idx = int(self.rng.integers(0, len(self.metas)))
        meta = self.metas[idx]
        try:
            wav, sr = audio_io.read_wav(meta["path"])
        except Exception as e:
            logger.info("failed to read %s: %s", meta["path"], e)
            return np.zeros(self.segment_samples, np.float32)
        wav = audio_io.convert_audio(wav, sr, self.cfg.sample_rate, 1)[0]
        t = wav.shape[-1]
        if t <= self.segment_samples:
            out = np.zeros(self.segment_samples, np.float32)
            out[:t] = wav
            return out
        start = int(self.rng.integers(0, t - self.segment_samples + 1))
        return wav[start:start + self.segment_samples]

    def batches(self, batch_size: int, num_batches: int) -> Iterator[np.ndarray]:
        """Yields [B, T, 1] float32 batches."""
        for _ in range(num_batches):
            if self.loader_threads:
                batch = self._native_batch(batch_size)
                if batch is not None:
                    yield batch
                    continue
            seg = np.stack([self.sample_segment() for _ in range(batch_size)])
            yield seg[..., None]

    def _native_batch(self, batch_size: int) -> Optional[np.ndarray]:
        from ..native import load_wav_batch

        idxs = self.rng.integers(0, len(self.metas), size=batch_size)
        fracs = self.rng.random(batch_size)
        paths = [self.metas[int(i)]["path"] for i in idxs]
        res = load_wav_batch(paths, self.cfg.sample_rate,
                             self.segment_samples, fracs,
                             n_threads=self.loader_threads)
        if res is None:  # no native lib: caller uses the python path
            return None
        out, errs = res
        for j in np.nonzero(errs)[0]:  # per-row fallback (resample etc.)
            out[j] = self.sample_segment(int(idxs[j]))
        return out[..., None]
