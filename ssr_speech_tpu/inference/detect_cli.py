"""Watermark detection CLI.

Surfaces the detector head of the watermark codec (reference
``data/tokenizer.py:136-138`` / ``wmencodec.py:377-382``): given a wav,
prints per-frame watermark decisions and the watermarked fraction — the
user-facing way to check whether audio was produced by this system.

  python -m ssr_speech_tpu.inference.detect_cli \
    --codec_path ckpt/wmencodec.th --audio out/edit.wav [--frames]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser("ssr_speech_tpu.inference.detect_cli")
    p.add_argument("--codec_path", required=True)
    p.add_argument("--audio", required=True, nargs="+")
    p.add_argument("--frames", action="store_true",
                   help="also print the per-frame 0/1 stream")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="watermarked-fraction above which audio is flagged")
    args = p.parse_args(argv)

    import numpy as np

    from .cli import load_codec
    from ..utils import audio as audio_io

    tok = load_codec(args.codec_path)
    hop = tok.cfg.hop_length
    for path in args.audio:
        wav = audio_io.load_for_codec(path, tok.sample_rate, hop)
        marks = tok.detect_watermark(wav)[0]
        frac = float(np.mean(marks))
        out = {
            "audio": path,
            "frames": int(marks.shape[0]),
            "watermarked_fraction": round(frac, 4),
            "flagged": frac >= args.threshold,
        }
        if args.frames:
            out["per_frame"] = marks.astype(int).tolist()
        print(json.dumps(out))


if __name__ == "__main__":
    main()
