"""Quality-eval CLI: score generated audio against references.

  python tools/eval_quality.py --pairs manifest.jsonl [--language en]
      [--whisper_model ID] [--speaker_model ID] [--visqol_bin PATH]
      [--out report.json]

``manifest.jsonl`` rows: {"ref": path, "gen": path, "text": optional
reference transcript, "hyp": optional hypothesis transcript}. Computes
SI-SNR always; WER/CER when transcripts are present or a Whisper model is
given; speaker similarity / ViSQOL when their models are given. Prints the
JSON report (the metric surface of the reference's eval stage +
paper protocol: WER, SIM, SI-SNR, ViSQOL).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--pairs", required=True, help="jsonl of {ref, gen, text?, hyp?}")
    p.add_argument("--language", default="en", choices=["en", "zh"])
    p.add_argument("--whisper_model", default=None)
    p.add_argument("--speaker_model", default=None)
    p.add_argument("--visqol_bin", default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from ssr_speech_tpu.utils import audio as audio_io
    from ssr_speech_tpu.utils import quality

    rows = [json.loads(line) for line in open(args.pairs) if line.strip()]
    pairs, sr = [], None
    for row in rows:
        ref, sr_r = audio_io.read_wav(row["ref"])
        gen, sr_g = audio_io.read_wav(row["gen"])
        assert sr_r == sr_g, (row, sr_r, sr_g)
        sr = sr_r
        # mono-mix [C, T] -> [T]: reshape(-1) would concatenate channels
        # end-to-end and destroy time alignment for stereo files
        pairs.append((ref.mean(axis=0), gen.mean(axis=0)))

    transcripts = None
    if all("text" in r and "hyp" in r for r in rows) and rows:
        transcripts = [(r["text"], r["hyp"]) for r in rows]
    ref_texts = [r.get("text") for r in rows] \
        if all("text" in r for r in rows) else None

    asr = None
    if args.whisper_model and transcripts is None:
        from ssr_speech_tpu.utils.asr import WhisperAligner

        aligner = WhisperAligner(args.whisper_model)

        def asr(wav, sr):
            out = aligner.pipe({"raw": wav, "sampling_rate": sr})
            return out.get("text", "")

    speaker = (quality.SpeakerEmbedder(args.speaker_model)
               if args.speaker_model else None)
    visqol = None
    if args.visqol_bin:
        from ssr_speech_tpu.utils.visqol import ViSQOL

        visqol = ViSQOL(args.visqol_bin, mode="speech")

    report = quality.evaluate_pairs(
        pairs, sr, transcripts=transcripts, language=args.language,
        ref_texts=ref_texts, asr=asr, speaker_model=speaker, visqol=visqol)
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
