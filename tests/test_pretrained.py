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


# ---------------------------------------------------------- real-weight gate

needs_goldens = pytest.mark.skipif(
    not os.path.isfile(os.path.join(GOLDEN_DIR, "parity_report.json")),
    reason="pretrained goldens not captured (run tools/capture_goldens.py "
           "with the published checkpoints)",
)


@needs_goldens
def test_pretrained_parity_report_all_ok():
    with open(os.path.join(GOLDEN_DIR, "parity_report.json")) as f:
        report = json.load(f)
    bad = {k: v for k, v in report.items() if not v.get("ok")}
    assert not bad, bad


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
