"""HTTP streaming-TTS server load probe: N concurrent clients, Poisson
arrivals, per-request TTFA/latency + server /health counters.

  python tools/http_load_probe.py --model_path bundle.pkl --codec_path \
      codec.pkl [--n_slots 8] [--clients 24] [--rate 0.9] [--text_len 80]

Starts the server in-process (engine thread owns the device), fires
requests on a Poisson schedule, and reports arrival-to-first-byte (network
TTFA), completion latency, aggregate PCM throughput, and the server's own
/health counters. Backs the SERVING.md / BENCHMARKS.md serving numbers on
real hardware; runs on CPU with tiny bundles for plumbing checks.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True)
    p.add_argument("--codec_path", required=True)
    p.add_argument("--n_slots", type=int, default=8)
    p.add_argument("--chunk_frames", type=int, default=25)
    p.add_argument("--clients", type=int, default=24)
    p.add_argument("--rate", type=float, default=0.9,
                   help="Poisson arrival rate (req/s)")
    p.add_argument("--text_len", type=int, default=80)
    p.add_argument("--sx_pad", type=int, default=128)
    p.add_argument("--p_pad", type=int, default=512)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args(argv)

    import jax

    from ssr_speech_tpu.config import DecodeConfig
    from ssr_speech_tpu.inference import stream as stream_mod
    from ssr_speech_tpu.inference.cli import load_codec, load_lm
    from ssr_speech_tpu.inference.http_server import TTSHttpServer

    params, cfg, _ = load_lm(args.model_path)
    audio_tok = load_codec(args.codec_path)
    dec = DecodeConfig(top_k=0, top_p=0.8, cfg_coef=1.5, cfg_stride=5,
                       aug_text=True, cfg_pretrained=True, stop_repetition=-1)
    server = stream_mod.StreamingServer(
        params, cfg, dec, audio_tok.params, audio_tok.cfg, args.n_slots,
        chunk_frames=args.chunk_frames, sx_pad=args.sx_pad, p_pad=args.p_pad)
    http = TTSHttpServer(server, port=0, sample_rate=audio_tok.sample_rate,
                         rng=jax.random.PRNGKey(args.seed)).start()
    host, port = http.address
    base = f"http://{host}:{port}"
    print(f"serving on {base} ({args.n_slots} lanes)", flush=True)

    rng = np.random.default_rng(args.seed)
    arrivals = np.cumsum(rng.exponential(1.0 / args.rate, args.clients))
    # payloads drawn on the MAIN thread: np Generators are not thread-safe
    payloads = [json.dumps({"text_ids": rng.integers(
        0, cfg.text_vocab_size - 1, size=(args.text_len,)).tolist()}).encode()
        for _ in range(args.clients)]
    results = [None] * args.clients

    def client(i):
        req = urllib.request.Request(
            base + "/tts", data=payloads[i],
            headers={"Content-Type": "application/json"})
        t0 = time.monotonic()
        try:
            resp = urllib.request.urlopen(req, timeout=600)
            first = None
            nbytes = 0
            while True:
                b = resp.read(8192)
                if not b:
                    break
                if first is None:
                    first = time.monotonic() - t0
                nbytes += len(b)
        except Exception as e:  # noqa: BLE001 - report, keep probing
            results[i] = dict(error=f"{type(e).__name__}: {e}")
            return
        if nbytes == 0:
            # error-truncated stream: the server signals a failed request
            # by closing the body early (module docstring contract)
            results[i] = dict(error="empty body (server-side error)")
            return
        results[i] = dict(ttfa=first, total=time.monotonic() - t0,
                          pcm_s=nbytes / 2 / audio_tok.sample_rate)

    t_start = time.monotonic()
    threads = []
    for i in range(args.clients):
        wait = t_start + arrivals[i] - time.monotonic()
        if wait > 0:
            time.sleep(wait)
        t = threading.Thread(target=client, args=(i,))
        t.start()
        threads.append(t)
    for t in threads:
        t.join()
    wall = time.monotonic() - t_start

    ok = [r for r in results if r and "error" not in r]
    errs = [r for r in results if (r is None or "error" in r)]
    ttfa = np.array(sorted(r["ttfa"] for r in ok if r["ttfa"] is not None))
    tot = np.array(sorted(r["total"] for r in ok))
    pcm = sum(r["pcm_s"] for r in ok)
    try:  # /health answers 503 when the engine died — still read the body
        health = json.loads(urllib.request.urlopen(base + "/health").read())
    except urllib.error.HTTPError as e:
        health = json.loads(e.read() or b"{}")
    except Exception as e:  # noqa: BLE001 - never lose the client report
        health = {"error": f"{type(e).__name__}: {e}"}
    print(json.dumps(dict(
        clients=args.clients, ok=len(ok), errors=len(errs),
        ttfa_p50_s=round(float(np.percentile(ttfa, 50)), 3) if len(ttfa) else None,
        ttfa_p95_s=round(float(np.percentile(ttfa, 95)), 3) if len(ttfa) else None,
        latency_p95_s=round(float(np.percentile(tot, 95)), 3) if len(tot) else None,
        pcm_seconds=round(pcm, 2), wall_s=round(wall, 2),
        x_realtime=round(pcm / wall, 2) if wall else None,
        health=health,
    )), flush=True)
    if errs:
        print("errors:", [r for r in errs if r][:3], file=sys.stderr)
    http.shutdown()


if __name__ == "__main__":
    main()
