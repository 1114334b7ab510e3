"""Generate FULL-GEOMETRY random-init reference checkpoints for golden capture.

The published SSR-Speech weights (``English.pth`` / ``Mandarin.pth`` /
``wmencodec.th``) are unreachable from this build environment (zero egress),
so the shipped-scale parity proof uses *synthetic* checkpoints instead: the
PyTorch reference models are instantiated at the exact published geometry
(``/root/reference/z_scripts/e830M.sh:38-49``: d_model 2048, nhead 16,
16 decoder layers, audio_vocab_size 2048 -> card 2056 with 5+1 specials,
text_vocab_size 100; codec per ``encodec_large_nq4_s320``) with seeded random
init, and saved in the exact published bundle layouts
(``steps/trainer.py:220-229`` for the LM; flat audiocraft export for the
codec). ``tools/capture_goldens.py --synth`` then drives the torch reference
through the BASELINE.md decode configs and verifies the JAX conversion
replays them bit-exactly — the same command validates the real published
weights the moment they are reachable.

Deterministic: same seeds -> same tensors (same torch build). A fingerprint
(SHA256 of sampled weight slices) is written next to the checkpoints so the
gated tests can detect a stale regeneration.

Usage:
  python tools/make_synth_checkpoints.py --out .synth_ckpt [--tiny] [--skip_zh]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
from argparse import Namespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

LM_SEED = 830
CODEC_SEED = 320

# Char vocab (<=100 ids, matching e830M text_vocab_size=100). The char
# fallback of data/tokenizer.py emits word chars + "_" separators; both the
# torch and JAX sides consume the SAME ids, so any deterministic vocab works.
EN_CHARS = list("abcdefghijklmnopqrstuvwxyz'") + ["_"] + list("0123456789")
ZH_TEXT = "食品价格以基本都在一万到两万之间小明说今天天气真好我们去公园散步吧"


def en_phn2num():
    return {c: i for i, c in enumerate(EN_CHARS)}


def zh_phn2num():
    chars = EN_CHARS + sorted(set(ZH_TEXT))
    assert len(chars) <= 100
    return {c: i for i, c in enumerate(chars)}


def e830m_args(tiny: bool = False) -> Namespace:
    """The argparse namespace the reference pickles into its LM bundles
    (config.py defaults overridden per z_scripts/e830M.sh:20-60)."""
    if tiny:
        d_model, nhead, layers, v = 64, 4, 2, 32
    else:
        d_model, nhead, layers, v = 2048, 16, 16, 2048
    return Namespace(
        n_special=5, audio_vocab_size=v,
        empty_token=v, eog=v + 1, audio_pad_token=v + 2, eos=v + 3,
        sos=v + 4, mts=v + 5, max_n_spans=3,
        text_vocab_size=100, text_pad_token=100,
        n_codebooks=4, d_model=d_model, nhead=nhead,
        num_decoder_layers=layers, audio_embedding_dim=d_model,
        text_embedding_dropout=0.0, audio_embedding_dropout=0.0,
        text_positional_embedding_dropout=0.0,
        audio_positional_embedding_dropout=0.0, trm_dropout=0.0,
        predict_mask_token=1, predict_all=0,
        codebook_weight=None, shuffle_mask_embedding=0,
    )


def _sd_fingerprint(sd, n_keys: int = 8) -> str:
    """SHA256 over evenly sampled weight slices (cheap, order-stable)."""
    h = hashlib.sha256()
    keys = sorted(sd.keys())
    for k in keys[:: max(1, len(keys) // n_keys)]:
        v = sd[k]
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        h.update(k.encode())
        h.update(np.ascontiguousarray(arr.reshape(-1)[:256]).tobytes())
    return h.hexdigest()


def build_lm_bundle(out_path: str, phn2num, seed: int, tiny: bool = False) -> str:
    import torch

    from reference_loader import load_reference_lm

    refssr = load_reference_lm()
    args = e830m_args(tiny)
    torch.manual_seed(seed)
    model = refssr.ssr.SSR_Speech(args).eval()
    sd = model.state_dict()
    fp = _sd_fingerprint(sd)
    torch.save(dict(model=sd, config=args, phn2num=phn2num), out_path)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"LM bundle {out_path}: {n_params/1e6:.1f}M params, fp {fp[:16]}")
    return fp


def build_codec(out_path: str, seed: int, tiny: bool = False) -> str:
    import torch

    from reference_loader import load_reference_modules

    from ssr_speech_tpu.config import CodecConfig, RVQConfig, SEANetConfig

    ref = load_reference_modules()
    if tiny:
        cfg = CodecConfig(
            seanet=SEANetConfig(dimension=16, n_filters=2,
                                n_residual_layers=1, ratios=(4, 2), lstm=1),
            rvq=RVQConfig(dimension=16, n_q=2, bins=17),
        )
    else:
        cfg = CodecConfig()
    sn = cfg.seanet
    torch.manual_seed(seed)
    kw = dict(channels=sn.channels, dimension=sn.dimension,
              n_filters=sn.n_filters, n_residual_layers=sn.n_residual_layers,
              ratios=list(sn.ratios), lstm=sn.lstm, norm=sn.norm,
              pad_mode=sn.pad_mode, causal=sn.causal)
    enc = ref.seanet.SEANetEncoder(**kw)
    dec = ref.seanet.SEANetDecoder(**kw, trim_right_ratio=sn.trim_right_ratio)
    wmd = ref.seanet.WMSEANetDecoder(**kw)
    rvq = ref.vq.ResidualVectorQuantizer(
        dimension=cfg.rvq.dimension, n_q=cfg.rvq.n_q, bins=cfg.rvq.bins,
        kmeans_init=False)
    # codebooks are uniform-init buffers; reseed them distinctly so encode
    # tie-breaks are exercised deterministically
    with torch.no_grad():
        for i, layer in enumerate(rvq.vq.layers):
            g = torch.Generator().manual_seed(seed + 1 + i)
            layer._codebook.embed.copy_(
                torch.randn(layer._codebook.embed.shape, generator=g) * 0.5)
            layer._codebook.embed_avg.copy_(layer._codebook.embed)
            layer._codebook.inited.fill_(True)
            layer._codebook.cluster_size.fill_(1.0)
    sd = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec),
                        ("wmdecoder", wmd), ("quantizer", rvq)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    fp = _sd_fingerprint(sd)
    torch.save(sd, out_path)
    n = sum(int(np.prod(v.shape)) for v in sd.values())
    print(f"codec {out_path}: {n/1e6:.1f}M tensors-elements, fp {fp[:16]}")
    return fp


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--out", default=".synth_ckpt")
    p.add_argument("--tiny", action="store_true",
                   help="tiny geometry (self-test of the tool, not goldens)")
    p.add_argument("--skip_zh", action="store_true")
    p.add_argument("--force", action="store_true",
                   help="regenerate even if fingerprint.json already exists")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    meta_path = os.path.join(args.out, "fingerprint.json")
    if os.path.isfile(meta_path) and not args.force:
        print(f"{meta_path} exists; --force to regenerate")
        return json.load(open(meta_path))

    meta = {"tiny": bool(args.tiny), "lm_seed": LM_SEED,
            "codec_seed": CODEC_SEED}
    meta["codec_fp"] = build_codec(
        os.path.join(args.out, "wmencodec.th"), CODEC_SEED, args.tiny)
    meta["lm_en_fp"] = build_lm_bundle(
        os.path.join(args.out, "English.pth"), en_phn2num(), LM_SEED, args.tiny)
    if not args.skip_zh:
        meta["lm_zh_fp"] = build_lm_bundle(
            os.path.join(args.out, "Mandarin.pth"), zh_phn2num(),
            LM_SEED + 1, args.tiny)
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta, indent=2))
    return meta


if __name__ == "__main__":
    main()
