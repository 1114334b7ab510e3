"""Pretrained-checkpoint pipeline: fetch resolution, loader round-trips, and
the gated real-weight golden replay.

fetch_checkpoint mirrors reference ``models/loaders.py:39-65``: local file,
dir+filename, URL (cached download), HF hub id. The URL path is exercised
against a localhost HTTP server (no egress needed). Real-weight goldens
(tools/capture_goldens.py artifacts) replay when present, else skip.
"""

import dataclasses
import json
import os
import threading

import numpy as np
import pytest

from ssr_speech_tpu.models import pretrained

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens", "pretrained")


def test_fetch_local_file(tmp_path):
    f = tmp_path / "ckpt.pkl"
    f.write_bytes(b"x")
    assert pretrained.fetch_checkpoint(str(f)) == str(f)


def test_fetch_dir_plus_filename(tmp_path):
    (tmp_path / "wmencodec.th").write_bytes(b"x")
    got = pretrained.fetch_checkpoint(str(tmp_path), filename="wmencodec.th")
    assert got == str(tmp_path / "wmencodec.th")
    with pytest.raises(FileNotFoundError):
        pretrained.fetch_checkpoint(str(tmp_path), filename="nope.th")


def test_fetch_url_downloads_and_caches(tmp_path):
    import http.server
    import socketserver

    payload = b"checkpoint-bytes-123"
    served = tmp_path / "srv"
    served.mkdir()
    (served / "model.th").write_bytes(payload)

    class H(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **k):
            super().__init__(*a, directory=str(served), **k)

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), H) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            cache = str(tmp_path / "cache")
            url = f"http://127.0.0.1:{port}/model.th"
            got = pretrained.fetch_checkpoint(url, cache_dir=cache)
            assert open(got, "rb").read() == payload
            # second fetch is a cache hit (server not consulted: same path)
            again = pretrained.fetch_checkpoint(url, cache_dir=cache)
            assert again == got
        finally:
            srv.shutdown()


def test_fetch_hub_id_requires_filename():
    with pytest.raises(AssertionError):
        pretrained.fetch_checkpoint("westbrook/SSR-Speech-English")


def test_load_lm_and_codec_roundtrip_our_bundles(tmp_path):
    """pretrained.load_* accept our own bundle format (what the CLI uses)."""
    import jax

    from ssr_speech_tpu.config import (
        CodecConfig, RVQConfig, SEANetConfig, tiny_ssr_config,
    )
    from ssr_speech_tpu.models import ssr as ssr_model
    from ssr_speech_tpu.models.codec import wmencodec as wm
    from ssr_speech_tpu.utils import checkpoint as ckpt

    cfg = tiny_ssr_config()
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
    lm_path = str(tmp_path / "lm.pkl")
    ckpt.save_bundle(lm_path, params=params,
                     model_config=dataclasses.asdict(cfg), phn2num={"a": 0})
    got_params, got_cfg, phn2num = pretrained.load_lm(lm_path)
    assert got_cfg.d_model == cfg.d_model and phn2num == {"a": 0}

    ccfg = CodecConfig(
        seanet=SEANetConfig(dimension=16, n_filters=2, n_residual_layers=1,
                            ratios=(4, 2), lstm=1),
        rvq=RVQConfig(dimension=16, n_q=2, bins=7),
    )
    cparams = wm.init_wmencodec(jax.random.PRNGKey(1), ccfg)
    c_path = str(tmp_path / "codec.pkl")
    ckpt.save_bundle(c_path, params=cparams, config=dataclasses.asdict(ccfg))
    tok = pretrained.load_codec(c_path)
    assert tok.cfg.rvq.bins == 7


def test_load_lm_torch_bundle_roundtrip(tmp_path):
    """A reference-layout torch bundle (steps/trainer.py:220-229) converts."""
    torch = pytest.importorskip("torch")
    from .reference_loader import load_reference_lm, reference_available

    if not reference_available():
        pytest.skip("reference tree absent")
    refssr = load_reference_lm()

    from argparse import Namespace

    v = 16
    args = Namespace(  # the argparse namespace the reference pickles
        n_special=5, audio_vocab_size=v,
        empty_token=v, eog=v + 1, audio_pad_token=v + 2, eos=v + 3,
        sos=v + 4, mts=v + 5, max_n_spans=3,
        text_vocab_size=30, text_pad_token=30,
        n_codebooks=4, d_model=32, nhead=4, num_decoder_layers=2,
        audio_embedding_dim=32,
        text_embedding_dropout=0.0, audio_embedding_dropout=0.0,
        text_positional_embedding_dropout=0.0,
        audio_positional_embedding_dropout=0.0, trm_dropout=0.0,
        predict_mask_token=1, predict_all=0,
        codebook_weight=None, shuffle_mask_embedding=0,
    )
    model = refssr.ssr.SSR_Speech(args).eval()
    path = str(tmp_path / "bundle.pth")
    torch.save(dict(model=model.state_dict(), config=args,
                    phn2num={"a": 0}), path)
    params, cfg, phn2num = pretrained.load_lm(path)
    assert cfg.d_model == 32 and cfg.num_layers == 2
    assert params["decoder"]["layers"]["qkv_w"].shape[0] == 2


def test_convert_strict_flags_unconsumed_keys(tmp_path):
    """A stray tensor in the bundle (layout drift / wrong geometry) raises
    instead of silently converting with gaps."""
    torch = pytest.importorskip("torch")
    from .reference_loader import load_reference_lm, reference_available

    if not reference_available():
        pytest.skip("reference tree absent")
    from ssr_speech_tpu.config import TokenSpace, tiny_ssr_config
    from ssr_speech_tpu.models import convert as cvt

    refssr = load_reference_lm()
    from tools.make_synth_checkpoints import e830m_args

    args = e830m_args(tiny=True)
    model = refssr.ssr.SSR_Speech(args).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = tiny_ssr_config()
    cvt.convert_ssr_lm(sd, cfg)  # clean bundle converts

    sd["decoder.layers.0.mystery_weight"] = sd["decoder.norm.weight"]
    with pytest.raises(ValueError, match="mystery_weight"):
        cvt.convert_ssr_lm(sd, cfg)
    del sd["decoder.layers.0.mystery_weight"]

    # a geometry mismatch (config says 1 layer, file has 2) also raises
    import dataclasses

    cfg1 = dataclasses.replace(cfg, num_layers=1)
    with pytest.raises(ValueError, match="not consumed"):
        cvt.convert_ssr_lm(sd, cfg1)


# ---------------------------------------------------------- real-weight gate

# live_deps: these prove the PUBLISHED weights (wmencodec.th / English.pth)
# the moment they are reachable — part of the opt-in live-backend gate
# (pytest -m live_deps, README "Live-backend tests")
needs_goldens = pytest.mark.skipif(
    not os.path.isfile(os.path.join(GOLDEN_DIR, "parity_report.json")),
    reason="pretrained goldens not captured (run tools/capture_goldens.py "
           "with the published checkpoints)",
)


@pytest.mark.live_deps
@needs_goldens
def test_pretrained_parity_report_all_ok():
    with open(os.path.join(GOLDEN_DIR, "parity_report.json")) as f:
        report = json.load(f)
    bad = {k: v for k, v in report.items() if not v.get("ok")}
    assert not bad, bad


@pytest.mark.live_deps
@needs_goldens
def test_pretrained_codec_roundtrip_replay():
    """Replay the codec round-trip from the stored wav/codes without torch:
    our converted weights must still reproduce the recorded codes."""
    pdir = os.environ.get("SSR_PRETRAINED_DIR", "./pretrained_models")
    codec_path = os.path.join(pdir, "wmencodec.th")
    if not os.path.isfile(codec_path):
        pytest.skip("wmencodec.th not present")
    from ssr_speech_tpu.models.codec import quantize as q
    from ssr_speech_tpu.models.codec import seanet as js

    z = np.load(os.path.join(GOLDEN_DIR, "codec_roundtrip.npz"))
    tok = pretrained.load_codec(codec_path)
    lat = np.asarray(js.encode(tok.params["encoder"], z["wav"], tok.cfg.seanet))
    codes = np.asarray(q.rvq_encode(tok.params["quantizer"], lat))
    np.testing.assert_array_equal(codes, z["codes"])
    recon = np.asarray(js.decode(
        tok.params["decoder"], q.rvq_decode(tok.params["quantizer"], codes),
        tok.cfg.seanet)).transpose(0, 2, 1)
    assert float(np.mean(np.abs(recon - z["recon"]))) < 1e-3


# ------------------------------------------- full-geometry synthetic goldens
#
# The published weights are unreachable (zero egress), so the shipped-scale
# proof uses synthetic full-geometry checkpoints (tools/make_synth_
# checkpoints.py: the reference torch models at the exact e830M.sh:38-49 /
# encodec_large_nq4_s320 geometry, seeded random init). tools/capture_
# goldens.py --synth drove the torch reference through the BASELINE decode
# configs; these tests replay the recorded inputs through the JAX stack with
# converted weights and demand bit-exact tokens / <1e-3 waveforms — the same
# validation that runs against the real weights the moment they are
# reachable.

SYNTH_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens",
                                "pretrained_synth")
SYNTH_CKPT_DIR = os.environ.get("SSR_SYNTH_CKPT", "/root/repo/.synth_ckpt")

needs_synth_goldens = pytest.mark.skipif(
    not os.path.isfile(os.path.join(SYNTH_GOLDEN_DIR, "parity_report.json")),
    reason="synthetic full-geometry goldens not captured "
           "(tools/make_synth_checkpoints.py + capture_goldens.py --synth)",
)


@pytest.fixture(scope="module")
def synth_ckpt():
    """The synthetic checkpoint dir, regenerated (deterministic seeds) when
    absent; skips if its fingerprint disagrees with the captured goldens."""
    torch = pytest.importorskip("torch")  # noqa: F841 - generation needs it
    from .reference_loader import reference_available

    if not reference_available():
        pytest.skip("reference tree absent (needed to regenerate)")
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    import make_synth_checkpoints as msc

    meta_path = os.path.join(SYNTH_CKPT_DIR, "fingerprint.json")
    if not os.path.isfile(meta_path):
        msc.main(["--out", SYNTH_CKPT_DIR, "--force"])
    with open(meta_path) as f:
        meta = json.load(f)
    with open(os.path.join(SYNTH_GOLDEN_DIR, "parity_report.json")) as f:
        report = json.load(f)
    want = report.get("checkpoint_fingerprint", {})
    for k in ("codec_fp", "lm_en_fp", "lm_zh_fp"):
        if want.get(k) and want[k] != meta.get(k):
            pytest.skip(f"synthetic checkpoints are stale vs goldens ({k}); "
                        f"rerun make_synth_checkpoints + capture_goldens")
    return SYNTH_CKPT_DIR


@needs_synth_goldens
def test_synth_parity_report_all_ok():
    with open(os.path.join(SYNTH_GOLDEN_DIR, "parity_report.json")) as f:
        report = json.load(f)
    bad = {k: v for k, v in report.items() if not v.get("ok")}
    assert not bad, bad


@needs_synth_goldens
@pytest.mark.slow
def test_synth_codec_full_geometry_replay(synth_ckpt):
    """wmencodec.th (full geometry) converts strictly and reproduces the
    recorded torch codes bit-exactly + recon within 1e-3 on the demo wav."""
    import jax

    from ssr_speech_tpu.models.codec import quantize as q
    from ssr_speech_tpu.models.codec import seanet as js

    z = np.load(os.path.join(SYNTH_GOLDEN_DIR, "codec_roundtrip.npz"))
    tok = pretrained.load_codec(os.path.join(synth_ckpt, "wmencodec.th"))
    with jax.default_matmul_precision("highest"):
        lat = np.asarray(js.encode(tok.params["encoder"], z["wav"],
                                   tok.cfg.seanet))
        codes = np.asarray(q.rvq_encode(tok.params["quantizer"], lat))
        np.testing.assert_array_equal(codes, z["codes"])
        recon = np.asarray(js.decode(
            tok.params["decoder"], q.rvq_decode(tok.params["quantizer"], codes),
            tok.cfg.seanet)).transpose(0, 2, 1)
    assert float(np.mean(np.abs(recon - z["recon"]))) < 1e-3


@needs_synth_goldens
@pytest.mark.slow
def test_synth_wmdecode_full_geometry_replay(synth_ckpt):
    """Watermark splice decode (BASELINE config 5) at full geometry."""
    import jax

    z = np.load(os.path.join(SYNTH_GOLDEN_DIR, "wm_decode.npz"))
    tok = pretrained.load_codec(os.path.join(synth_ckpt, "wmencodec.th"))
    wav = np.zeros((1, z["codes"].shape[1] * tok.cfg.hop_length, 1),
                   np.float32)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(tok.wmdecode(z["codes"][None], z["marks"][None], wav))
    assert float(np.mean(np.abs(got.transpose(0, 2, 1) - z["audio"]))) < 1e-3


# the 830M fp32 CPU decode replays are ~30-50 min EACH on a cold XLA cache
# (measured: capture's jax side 3073 s on this 1-core box) — they are the
# direct validators but default-skip; capture_goldens --synth already ran
# the identical equality check and test_synth_parity_report_all_ok keeps
# its result green in-suite. Set SSR_FULL_REPLAY=1 to run them directly.
needs_full_replay = pytest.mark.skipif(
    os.environ.get("SSR_FULL_REPLAY", "0") != "1",
    reason="830M CPU decode replay is ~30-50 min/config on a cold cache; "
           "set SSR_FULL_REPLAY=1 (equality already proven by "
           "capture_goldens --synth, kept green via parity_report)",
)


def _replay_lm_config(synth_ckpt, bundle_name, golden_name):
    import jax

    from ssr_speech_tpu.config import DecodeConfig
    from ssr_speech_tpu.inference import decode as jdec

    z = np.load(os.path.join(SYNTH_GOLDEN_DIR, golden_name + ".npz"))
    kw = json.loads(str(z["decode_kwargs"]))
    params, jcfg, _phn2num = pretrained.load_lm(
        os.path.join(synth_ckpt, bundle_name))
    assert jcfg.d_model == 2048 and jcfg.num_layers == 16  # shipped geometry
    dcfg = DecodeConfig(
        top_k=1, top_p=1.0, temperature=1.0, stop_repetition=-1,
        cfg_coef=kw.get("cfg_coef", 1.5), cfg_stride=kw.get("cfg_stride", 1),
        aug_text=kw.get("aug_text", False),
        cfg_pretrained=kw.get("cfg_pretrained", True),
        max_gen_per_span=512, length_cap_mult=10,
    )
    mask = [tuple(m) for m in np.asarray(z["mask"])]
    got, got_marks, _, _ = jdec.generate(
        params, jcfg, dcfg, z["x"], z["y"], mask,
        jax.random.PRNGKey(int(z["seed"])), dtype_name="float32")
    np.testing.assert_array_equal(got[0], z["codes"])
    np.testing.assert_array_equal(got_marks[0], z["marks"])


@needs_synth_goldens
@needs_full_replay
@pytest.mark.slow
def test_synth_lm_830m_edit_replay(synth_ckpt):
    """BASELINE config 3 (en edit, aug_text + CFG stride 5) at the shipped
    830M geometry: converted weights reproduce the torch reference's greedy
    token stream bit-exactly. ~minutes: a full-geometry fp32 CPU decode."""
    _replay_lm_config(synth_ckpt, "English.pth", "en_edit_cfg5")


@needs_synth_goldens
@needs_full_replay
@pytest.mark.slow
def test_synth_lm_830m_tts_replay(synth_ckpt):
    """BASELINE config 2 (en TTS greedy) at 830M, bit-exact."""
    _replay_lm_config(synth_ckpt, "English.pth", "en_tts_greedy")


@needs_synth_goldens
@needs_full_replay
@pytest.mark.slow
def test_synth_lm_830m_zh_edit_replay(synth_ckpt):
    """BASELINE config 4 (zh edit, cfg_stride=1) at 830M, bit-exact."""
    if not os.path.isfile(os.path.join(SYNTH_GOLDEN_DIR, "zh_edit_cfg1.npz")):
        pytest.skip("zh golden not captured")
    _replay_lm_config(synth_ckpt, "Mandarin.pth", "zh_edit_cfg1")


def test_capture_goldens_exits_cleanly_without_weights(tmp_path):
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "tools/capture_goldens.py",
         "--pretrained_dir", str(tmp_path)],
        cwd="/root/repo", capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode != 0
    assert "download the published checkpoints" in (proc.stdout + proc.stderr)
