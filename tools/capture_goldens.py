"""Capture golden outputs from the PyTorCH reference with the PUBLISHED
pretrained checkpoints, and verify our converted weights against them.

One command produces golden artifacts + a parity report (VERDICT round-1
item 3; BASELINE.md protocol configs):

  python tools/capture_goldens.py --pretrained_dir ./pretrained_models \
      --out tests/goldens/pretrained

Needs: ``wmencodec.th`` and ``English.pth`` (optionally ``Mandarin.pth``)
under --pretrained_dir (README "Pretrained Models": download from
huggingface.co/westbrook/SSR-Speech-English), the reference tree at
/root/reference, torch, and (for the text configs) espeak-ng.

Captured per BASELINE.md:
  1. wmencodec encode->decode round-trip codes + waveform on the demo wav,
  2. en zero-shot TTS, greedy, no CFG,
  3. en editing, aug_text cfg_stride=5 (greedy for determinism),
  4. zh editing, cfg_stride=1 (when Mandarin.pth is present),
  5. batched/watermark path: wmdecode waveform for config-3's splice.

The companion gated test (tests/test_pretrained.py (the gated replay tests)) replays the same
inputs through the JAX implementation and asserts parity against these
artifacts without needing torch at test time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

DEMO_EDIT = "/root/reference/demo/84_121550_000074_000000.wav"
DEMO_TTS = "/root/reference/demo/5895_34622_000026_000002.wav"
DEMO_ZH = "/root/reference/demo/aishell3_test.wav"

EDIT_TRANSCRIPT = ("but when i had approached so near to them the common "
                   "object which the sense deceives lost not by distance any "
                   "of its marks")
EDIT_TARGET = ("but when i saw the mirage of the lake in the distance which "
               "the sense deceives lost not by distance any of its marks")
TTS_TARGET = ("i cannot believe that the same model can also do text to "
              "speech synthesis too")
ZH_TARGET = "食品价格以基本都在一万到两万之间"

# --synth variants: the reference decode loop hard-caps the TOTAL sequence at
# x_len*10 frames (models/ssr.py:739), and a random-init LM rarely emits eog,
# so the synthetic captures bound wall time by cropping the prompt/edit wavs
# and sizing the target text so cap - prefix ≈ 150-250 generated frames
# (~1 s/frame torch-CPU at 830M). Decode-config semantics (CFG stride,
# aug_text, splice, wmdecode) are identical to the BASELINE configs.
SYNTH_TTS_TARGET = "the tpu rebuild speaks for itself today"
SYNTH_TTS_SECONDS = 2.0      # prompt 100 frames; cap = |x|*10 ≈ 350
SYNTH_EDIT_TARGET = "but when i saw the lake in the distance it was gone"
SYNTH_EDIT_SECONDS = 3.0     # context 150 frames; cap ≈ 440
SYNTH_ZH_TARGET = "食品价格以基本都在一万到两万之间"
SYNTH_ZH_SECONDS = 3.0


def _torch_codec(codec_path):
    """Build the reference SEANet/RVQ modules with the published weights."""
    import torch

    from reference_loader import load_reference_modules

    from ssr_speech_tpu.config import CodecConfig
    from ssr_speech_tpu.models.pretrained import _unwrap_state_dict

    ref = load_reference_modules()
    cfg = CodecConfig()
    sn = cfg.seanet
    obj = torch.load(codec_path, map_location="cpu", weights_only=False)
    sd = _unwrap_state_dict(obj)
    kw = dict(channels=sn.channels, dimension=sn.dimension,
              n_filters=sn.n_filters, n_residual_layers=sn.n_residual_layers,
              ratios=list(sn.ratios), lstm=sn.lstm, norm=sn.norm,
              pad_mode=sn.pad_mode, causal=sn.causal)
    enc = ref.seanet.SEANetEncoder(**kw).eval()
    dec = ref.seanet.SEANetDecoder(**kw, trim_right_ratio=sn.trim_right_ratio).eval()
    wmd = ref.seanet.WMSEANetDecoder(**kw).eval()
    rvq = ref.vq.ResidualVectorQuantizer(
        dimension=cfg.rvq.dimension, n_q=cfg.rvq.n_q, bins=cfg.rvq.bins,
        kmeans_init=False).eval()

    def sub(prefix):
        return {k[len(prefix) + 1:]: torch.as_tensor(v)
                for k, v in sd.items() if k.startswith(prefix + ".")}

    enc.load_state_dict(sub("encoder"))
    dec.load_state_dict(sub("decoder"))
    wmd.load_state_dict(sub("wmdecoder"))
    rvq.load_state_dict(sub("quantizer"))
    return enc, dec, wmd, rvq, sd, cfg


def _load_wav(path, cfg, max_seconds=None):
    from ssr_speech_tpu.utils import audio as audio_io

    wav = audio_io.load_for_codec(path, cfg.sample_rate, cfg.hop_length)
    if max_seconds is not None:
        n = int(max_seconds * cfg.sample_rate)
        n -= n % cfg.hop_length
        wav = wav[:, :n, :]
    return wav


def capture_codec(codec_path, out_dir, report):
    import torch

    enc, dec, wmd, rvq, sd, cfg = _torch_codec(codec_path)
    wav = _load_wav(DEMO_EDIT, cfg)
    x_t = torch.from_numpy(wav.transpose(0, 2, 1))
    with torch.no_grad():
        codes = rvq.encode(enc(x_t))
        recon = dec(rvq.decode(codes)).numpy()
    np.savez(os.path.join(out_dir, "codec_roundtrip.npz"),
             wav=wav, codes=codes.numpy(), recon=recon)

    # our implementation, converted from the same file
    from ssr_speech_tpu.models import pretrained
    from ssr_speech_tpu.models.codec import quantize as q
    from ssr_speech_tpu.models.codec import seanet as js

    tok = pretrained.load_codec(codec_path)
    got_lat = np.asarray(js.encode(tok.params["encoder"], wav, cfg.seanet))
    got_codes = np.asarray(q.rvq_encode(tok.params["quantizer"], got_lat))
    code_match = bool(np.array_equal(got_codes, codes.numpy()))
    got_recon = np.asarray(js.decode(
        tok.params["decoder"], q.rvq_decode(tok.params["quantizer"], got_codes),
        cfg.seanet)).transpose(0, 2, 1)
    mae = float(np.mean(np.abs(got_recon - recon)))
    report["codec_roundtrip"] = dict(codes_bit_exact=code_match, mae=mae,
                                     mae_target=1e-3, ok=code_match and mae < 1e-3)
    return cfg


def _phonemize(text, phn2num, language, allow_char_fallback=False):
    from ssr_speech_tpu.data.tokenizer import TextTokenizer, tokenize_text

    tok = TextTokenizer(language="cmn" if language == "zh" else "en-us")
    if tok.backend is None and not allow_char_fallback:
        raise RuntimeError("espeak-ng required to phonemize for the text "
                           "configs; only codec goldens were captured")
    # char fallback (--synth): both the torch reference and the JAX decode
    # consume the SAME ids, so any deterministic text->id map proves parity
    phones = tokenize_text(tok, text)
    return np.asarray([phn2num[p] for p in phones if p in phn2num], np.int64)


def _write_report(out_dir, report):
    """Incremental (crash-safe) report writes: each stage costs minutes to
    hours on this host, so a late failure must not lose earlier results."""
    with open(os.path.join(out_dir, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=2)


def _torch_lm(lm_path):
    import torch

    from reference_loader import load_reference_lm

    refssr = load_reference_lm()
    bundle = torch.load(lm_path, map_location="cpu", weights_only=False)
    args = bundle["config"]
    model = refssr.ssr.SSR_Speech(args).eval()
    model.load_state_dict(bundle["model"])
    return model, bundle["phn2num"], args


def capture_lm_config(name, lm_path, codec_path, wav_path, target_text,
                      mask_builder, decode_kwargs, language, out_dir, report,
                      seed=1, max_seconds=None, allow_char_fallback=False,
                      max_gen_per_span=4000, resume=False):
    import time

    from ssr_speech_tpu.models import pretrained

    t0 = time.monotonic()
    npz_path = os.path.join(out_dir, f"{name}.npz")
    if resume and os.path.isfile(npz_path) and report.get(name, {}).get("ok"):
        # stage fully verified by a previous (crash-interrupted) run whose
        # incremental report we preloaded — each 830M replay costs ~35 min
        # on this 1-core host, don't repeat it
        print(f"[{name}] already verified (resume) — skipped", flush=True)
        z = np.load(npz_path)
        return z["codes"]
    if resume and os.path.isfile(npz_path):
        # torch side already captured (each 830M torch decode costs minutes
        # on this 1-core host) — replay-verify only
        z = np.load(npz_path)
        x, y, mask = z["x"], z["y"], [tuple(m) for m in np.asarray(z["mask"])]
        res_codes, res_marks = z["codes"], z["marks"]
        seed = int(z["seed"])
        assert json.loads(str(z["decode_kwargs"])) == decode_kwargs, name
    else:
        import torch

        model, phn2num, _ = _torch_lm(lm_path)
        tok = pretrained.load_codec(codec_path)
        cfg = tok.cfg
        wav = _load_wav(wav_path, cfg, max_seconds=max_seconds)
        codes, _, _ = tok.encode(wav)
        y = codes[0]
        x = _phonemize(target_text, phn2num, language,
                       allow_char_fallback=allow_char_fallback)
        mask = mask_builder(y.shape[1])

        torch.manual_seed(seed)
        with torch.no_grad():
            res, marks, masks, nmi = model.inference(
                torch.from_numpy(x[None]).long(), torch.tensor([len(x)]),
                torch.zeros(1, 0).long(), torch.tensor([0]),
                torch.from_numpy(y.T[None].astype(np.int64)),
                torch.from_numpy(y.T[None].astype(np.int64)),
                mask_interval=torch.tensor(mask).unsqueeze(0),
                top_k=1, top_p=1.0, temperature=1.0, stop_repetition=-1,
                kvcache=1, **decode_kwargs,
            )
        res_codes, res_marks = res[0].numpy(), marks[0].numpy()
        np.savez(npz_path, x=x, y=y, mask=np.asarray(mask), codes=res_codes,
                 marks=res_marks,
                 decode_kwargs=json.dumps(decode_kwargs), seed=seed)
    torch_s = time.monotonic() - t0

    # parity with the JAX decode, converted weights
    t1 = time.monotonic()
    import jax

    from ssr_speech_tpu.config import DecodeConfig
    from ssr_speech_tpu.inference import decode as jdec

    params, jcfg, _ = pretrained.load_lm(lm_path)
    dcfg = DecodeConfig(
        top_k=1, top_p=1.0, temperature=1.0, stop_repetition=-1,
        cfg_coef=decode_kwargs.get("cfg_coef", 1.5),
        cfg_stride=decode_kwargs.get("cfg_stride", 1),
        aug_text=decode_kwargs.get("aug_text", False),
        cfg_pretrained=decode_kwargs.get("cfg_pretrained", True),
        max_gen_per_span=max_gen_per_span, length_cap_mult=10,
    )
    got, got_marks, _, _ = jdec.generate(
        params, jcfg, dcfg, x, y, mask, jax.random.PRNGKey(seed),
        dtype_name="float32")
    match = bool(np.array_equal(got[0], res_codes)
                 and np.array_equal(got_marks[0], res_marks))
    report[name] = dict(tokens_bit_exact=match,
                        n_tokens=int(res_codes.shape[-1]), ok=match,
                        torch_s=round(torch_s, 1),
                        jax_s=round(time.monotonic() - t1, 1))
    print(f"[{name}] n_tokens={res_codes.shape[-1]} bit_exact={match} "
          f"torch={torch_s:.0f}s jax={time.monotonic() - t1:.0f}s", flush=True)
    return res_codes


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--pretrained_dir", default="./pretrained_models")
    p.add_argument("--out", default=None,
                   help="default tests/goldens/pretrained "
                        "(tests/goldens/pretrained_synth with --synth)")
    p.add_argument("--skip_zh", action="store_true")
    p.add_argument("--synth", action="store_true",
                   help="capture from synthetic full-geometry checkpoints "
                        "(tools/make_synth_checkpoints.py): cropped wavs, "
                        "short targets, char-fallback phonemization")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu", ""],
                   help="JAX platform for the replay side; cpu (default) "
                        "keeps fp32 matmuls bit-stable vs the fp32 torch "
                        "reference (TPU default precision is bf16)")
    p.add_argument("--resume", action="store_true",
                   help="skip the torch decode of configs whose .npz already "
                        "exists (the JAX replay+report always re-runs)")
    args = p.parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if os.environ.get("SSR_JAX_CACHE", "1") != "0":
        # share compiled decode programs with the gated replay tests
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.out is None:
        args.out = ("tests/goldens/pretrained_synth" if args.synth
                    else "tests/goldens/pretrained")

    codec_path = os.path.join(args.pretrained_dir, "wmencodec.th")
    lm_en = os.path.join(args.pretrained_dir, "English.pth")
    lm_zh = os.path.join(args.pretrained_dir, "Mandarin.pth")
    if not os.path.isfile(codec_path):
        sys.exit(f"missing {codec_path}: download the published checkpoints "
                 "first (see module docstring)")
    os.makedirs(args.out, exist_ok=True)
    report = {}
    fp = None
    if args.synth:
        fp_path = os.path.join(args.pretrained_dir, "fingerprint.json")
        if os.path.isfile(fp_path):  # lets the replay tests detect staleness
            fp = json.load(open(fp_path))
            report["checkpoint_fingerprint"] = dict(fp)
            report["checkpoint_fingerprint"]["ok"] = True
    if args.resume:
        # preload verified stages from a prior interrupted run so they can
        # be skipped wholesale (guarded by checkpoint fingerprint match)
        prior_path = os.path.join(args.out, "parity_report.json")
        if os.path.isfile(prior_path):
            prior = json.load(open(prior_path))
            prior_fp = prior.pop("checkpoint_fingerprint", None)
            if prior_fp is not None:
                prior_fp.pop("ok", None)
            if not args.synth or prior_fp == fp:
                for k, v in prior.items():
                    if v.get("ok"):
                        report[k] = v

    if report.get("codec_roundtrip", {}).get("ok") and os.path.isfile(
            os.path.join(args.out, "codec_roundtrip.npz")):
        print("[codec_roundtrip] already verified (resume) — skipped",
              flush=True)
    else:
        capture_codec(codec_path, args.out, report)

    tts_target = SYNTH_TTS_TARGET if args.synth else TTS_TARGET
    edit_target = SYNTH_EDIT_TARGET if args.synth else EDIT_TARGET
    zh_target = SYNTH_ZH_TARGET if args.synth else ZH_TARGET
    tts_secs = SYNTH_TTS_SECONDS if args.synth else None
    edit_secs = SYNTH_EDIT_SECONDS if args.synth else None
    zh_secs = SYNTH_ZH_SECONDS if args.synth else None

    if os.path.isfile(lm_en):
        # config 2: en TTS greedy no-CFG — mask is a zero-length span at end
        capture_lm_config(
            "en_tts_greedy", lm_en, codec_path, DEMO_TTS, tts_target,
            lambda F: [(F, F)],
            dict(cfg_coef=1.5, cfg_stride=1, aug_text=False,
                 aug_context=False, cfg_pretrained=True),
            "en", args.out, report,
            max_seconds=tts_secs, allow_char_fallback=args.synth,
            max_gen_per_span=512 if args.synth else 4000,
            resume=args.resume)
        _write_report(args.out, report)
        # config 3: en editing with CFG stride 5
        capture_lm_config(
            "en_edit_cfg5", lm_en, codec_path, DEMO_EDIT, edit_target,
            lambda F: [(int(0.28 * F), int(0.55 * F))],
            dict(cfg_coef=1.5, cfg_stride=5, aug_text=True,
                 aug_context=False, cfg_pretrained=True),
            "en", args.out, report,
            max_seconds=edit_secs, allow_char_fallback=args.synth,
            max_gen_per_span=512 if args.synth else 4000,
            resume=args.resume)
        _write_report(args.out, report)
    if os.path.isfile(lm_zh) and not args.skip_zh:
        # config 4: zh editing, cfg_stride 1
        capture_lm_config(
            "zh_edit_cfg1", lm_zh, codec_path, DEMO_ZH, zh_target,
            lambda F: [(int(0.3 * F), int(0.6 * F))],
            dict(cfg_coef=1.5, cfg_stride=1, aug_text=True,
                 aug_context=False, cfg_pretrained=True),
            "zh", args.out, report,
            max_seconds=zh_secs, allow_char_fallback=args.synth,
            max_gen_per_span=512 if args.synth else 4000,
            resume=args.resume)
        _write_report(args.out, report)

    # config 5: watermark decode of the edit splice (uses config-3 artifacts)
    edit_npz = os.path.join(args.out, "en_edit_cfg5.npz")
    if report.get("wm_decode", {}).get("ok") and os.path.isfile(
            os.path.join(args.out, "wm_decode.npz")):
        print("[wm_decode] already verified (resume) — skipped", flush=True)
    elif os.path.isfile(edit_npz):
        import torch

        enc, dec, wmd, rvq, sd, cfg = _torch_codec(codec_path)
        z = np.load(edit_npz)
        raw_codes = z["codes"]
        if args.synth:
            # a random-init LM legitimately emits empty_token/pad (>=bins)
            # mid-stream; the RVQ embedding only spans [0, bins) — clamp for
            # the codec stage (a no-op with trained weights, whose streams
            # carry codec tokens only)
            raw_codes = np.minimum(raw_codes, cfg.rvq.bins - 1)
        codes = torch.from_numpy(raw_codes[None].astype(np.int64))
        marks = torch.from_numpy(z["marks"][None].astype(np.int64))
        wav = np.zeros((1, 1, codes.shape[-1] * cfg.hop_length), np.float32)
        with torch.no_grad():
            audio = wmd(rvq.decode(codes), marks, torch.from_numpy(wav))[0].numpy()
        np.savez(os.path.join(args.out, "wm_decode.npz"),
                 codes=raw_codes, marks=z["marks"], audio=audio)
        from ssr_speech_tpu.models import pretrained
        from ssr_speech_tpu.models.codec import wmencodec as jwm

        tok = pretrained.load_codec(codec_path)
        got = np.asarray(tok.wmdecode(raw_codes[None], z["marks"][None],
                                      wav.transpose(0, 2, 1)))
        mae = float(np.mean(np.abs(got.transpose(0, 2, 1) - audio)))
        report["wm_decode"] = dict(mae=mae, ok=mae < 1e-3)

    with open(os.path.join(args.out, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    bad = [k for k, v in report.items() if not v.get("ok")]
    if bad:
        sys.exit(f"PARITY FAILURES: {bad}")
    print(f"all {len(report)} configs parity-OK; goldens in {args.out}")


if __name__ == "__main__":
    main()
