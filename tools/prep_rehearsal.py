"""Data-prep scale rehearsal: synthetic corpus -> full prep pipeline ->
train_lm, with measured encode throughput.

Exercises the ENTIRE reference data path (README.md:195-249) end-to-end on
generated audio: wav synthesis -> ``prep encode`` (TPU-batched wmencodec) ->
``prep phonemize`` (GigaSpeech tag round trip; char fallback without espeak)
-> ``prep filemaker`` -> ``prep vocab`` -> a few ``train_lm`` steps consuming
the artifacts. Prints one JSON report with per-stage wall times and encode
throughput (audio-hours per chip-hour) to compare against the ~3.5
chip-hours / 10k-hours estimate in BENCHMARKS.md.

  python tools/prep_rehearsal.py --out /tmp/rehearsal --n_utts 1000
  python tools/prep_rehearsal.py --out /tmp/r --n_utts 12 --tiny  # CPU smoke
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = ("the tpu rebuild speaks for itself today and tomorrow with spans "
         "masked tokens codecs watermark decode speech synthesis model "
         "training data pipeline phoneme vocab manifest bucket").split()
GARBAGE_TAGS = ["<MUSIC>", "<SIL>"]
PUNCT_TAGS = ["<COMMA>", "<PERIOD>"]


def synth_corpus(out, n_utts, sr=16000, seed=0, tiny=False):
    """Random tone+noise wavs (lognormal 2-12 s) + synthetic transcripts
    (some carrying GigaSpeech tags)."""
    from ssr_speech_tpu.utils import audio as audio_io

    rng = np.random.default_rng(seed)
    wav_dir = os.path.join(out, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    manifest, tsv, total_sec = [], [], 0.0
    for i in range(n_utts):
        dur = float(np.clip(rng.lognormal(1.2, 0.4), 2.0, 12.0))
        if tiny:
            dur = min(dur, 3.0)
        n = int(dur * sr)
        t = np.arange(n) / sr
        f0 = float(rng.uniform(80, 400))
        wav = (0.3 * np.sin(2 * np.pi * f0 * t)
               + 0.05 * rng.normal(size=n)).astype(np.float32)
        seg = f"utt{i:05d}"
        path = os.path.join(wav_dir, seg + ".wav")
        audio_io.write_wav(path, wav[None], sr)
        nw = int(rng.integers(8, 28))
        words = list(rng.choice(WORDS, size=nw))
        if i % 7 == 0:  # sprinkle garbage tags like GigaSpeech transcripts
            words.insert(int(rng.integers(1, nw)),
                         GARBAGE_TAGS[(i // 7) % len(GARBAGE_TAGS)])
        if i % 5 == 1:  # and punctuation tags (leading-space collapse)
            words.insert(int(rng.integers(1, nw)),
                         PUNCT_TAGS[(i // 5) % len(PUNCT_TAGS)])
        manifest.append(f"{path}\t{seg}")
        tsv.append(f"{seg}\t{' '.join(words)}")
        total_sec += dur
    with open(os.path.join(out, "wav_manifest.tsv"), "w") as f:
        f.write("\n".join(manifest))
    with open(os.path.join(out, "text_manifest.tsv"), "w") as f:
        f.write("\n".join(tsv))
    return total_sec


def make_codec_bundle(out, tiny=False):
    """Random-init codec bundle (full geometry unless --tiny)."""
    import jax

    from ssr_speech_tpu.config import CodecConfig, RVQConfig, SEANetConfig
    from ssr_speech_tpu.models.codec import wmencodec as wm
    from ssr_speech_tpu.utils import checkpoint as ckpt

    cfg = (CodecConfig(seanet=SEANetConfig(dimension=16, n_filters=2,
                                           n_residual_layers=1, ratios=(8, 5, 4, 2),
                                           lstm=1),
                       rvq=RVQConfig(dimension=16, n_q=4, bins=2048))
           if tiny else CodecConfig())
    params = wm.init_wmencodec(jax.random.PRNGKey(1), cfg)
    path = os.path.join(out, "codec.pkl")
    ckpt.save_bundle(path, params=params, config=dataclasses.asdict(cfg))
    return path


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--n_utts", type=int, default=1000)
    p.add_argument("--tiny", action="store_true",
                   help="tiny codec + CPU-friendly sizes (smoke test)")
    p.add_argument("--train_steps", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=16)
    args = p.parse_args(argv)
    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ssr_speech_tpu import train_lm
    from ssr_speech_tpu.data import prep

    os.makedirs(args.out, exist_ok=True)
    report = {"n_utts": args.n_utts, "tiny": bool(args.tiny)}

    t0 = time.monotonic()
    total_sec = synth_corpus(args.out, args.n_utts, tiny=args.tiny)
    report["corpus_audio_sec"] = round(total_sec, 1)
    report["synth_s"] = round(time.monotonic() - t0, 1)

    codec_path = make_codec_bundle(args.out, tiny=args.tiny)
    ds = os.path.join(args.out, "dataset")
    codes_dir = os.path.join(ds, "codes")
    phn_dir = os.path.join(ds, "phonemes")
    os.makedirs(ds, exist_ok=True)

    t0 = time.monotonic()
    prep.main(["encode", "--manifest", os.path.join(args.out, "wav_manifest.tsv"),
               "--codec_path", codec_path, "--save_dir", codes_dir,
               "--batch_size", str(args.batch_size)])
    enc_s = time.monotonic() - t0
    report["encode_s"] = round(enc_s, 1)
    report["encode_audio_hours_per_chip_hour"] = round(
        (total_sec / 3600.0) / (enc_s / 3600.0), 1)

    t0 = time.monotonic()
    prep.main(["phonemize", "--manifest",
               os.path.join(args.out, "text_manifest.tsv"),
               "--save_dir", phn_dir, "--num_workers", "2"])
    report["phonemize_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    prep.main(["filemaker", "--manifest",
               os.path.join(args.out, "text_manifest.tsv"),
               "--phn_dir", phn_dir, "--codes_dir", codes_dir,
               "--output", os.path.join(ds, "manifest", "train.txt"),
               "--min_frames", "50"])
    # the same list serves as validation for the smoke run
    import shutil

    shutil.copy(os.path.join(ds, "manifest", "train.txt"),
                os.path.join(ds, "manifest", "validation.txt"))
    prep.main(["vocab", "--phn_dir", phn_dir,
               "--output", os.path.join(ds, "vocab.txt")])
    report["filemaker_vocab_s"] = round(time.monotonic() - t0, 1)
    with open(os.path.join(ds, "manifest", "train.txt")) as f:
        report["kept_utts"] = sum(1 for l in f if l.strip())

    # ---- consume the artifacts: a few train_lm steps (tiny LM geometry)
    t0 = time.monotonic()
    train_lm.main([
        "--exp_dir", os.path.join(args.out, "exp"), "--dataset_dir", ds,
        "--encodec_folder_name", "codes", "--manifest_name", "manifest",
        "--d_model", "64", "--nhead", "4", "--num_decoder_layers", "2",
        "--audio_vocab_size", "2048", "--text_vocab_size", "100",
        "--n_codebooks", "4", "--num_epochs", "1",
        "--num_steps", str(args.train_steps),
        "--val_every_n_steps", "1000", "--print_every_n_steps", "1",
        "--max_num_tokens", "2500", "--num_buckets", "2",
        "--audio_min_length", "1.0", "--audio_max_length", "15.0",
        "--text_min_length", "2", "--optimizer_name", "scaledadam",
        "--lr", "0.01",
    ])
    report["train_smoke_s"] = round(time.monotonic() - t0, 1)
    report["ok"] = True
    print(json.dumps(report))
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
