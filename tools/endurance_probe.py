"""Serving endurance soak on the real chip: StreamingServer.serve_loop under
a sustained request stream, tracking RSS / latency / throughput drift.

The open-ended engine claims to run indefinitely with no cache compaction
(inference/serve.py paged rows; inference/stream.py lanes). This probe holds
it to that: full 830M geometry + causal codec, S lanes, a Poisson arrival
stream for ``--minutes`` (or ``--n_requests``), sampling host RSS and
rolling TTFA/latency percentiles per 60-request window; the final JSON line
reports first-window vs last-window drift. Leak criteria: RSS slope ≈ 0
after the first window; stable p95; all lanes free at exit.

  python tools/endurance_probe.py --minutes 30
  python tools/endurance_probe.py --n_requests 300    # quicker soak
"""

import argparse
import dataclasses
import json
import os
import sys
import time
from collections import deque

t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ssr_speech_tpu.config import CodecConfig, DecodeConfig, SSRModelConfig
from ssr_speech_tpu.inference import stream as stream_mod
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.models.codec import wmencodec as wm


def rss_mb():
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 2**20


def pctl(xs, q):
    return float(np.percentile(np.asarray(xs), q)) if xs else None


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--minutes", type=float, default=0.0)
    p.add_argument("--n_requests", type=int, default=300)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--window", type=int, default=60)
    p.add_argument("--gen_frames", type=int, default=200)  # 4 s per request
    args = p.parse_args()

    S = args.slots
    T = 100  # 2 s prompt
    cfg = SSRModelConfig(d_model=2048, nhead=16, num_layers=16, n_codebooks=4,
                         text_vocab_size=120)
    ts = cfg.tokens
    codec_cfg = CodecConfig()
    codec_cfg = dataclasses.replace(
        codec_cfg, seanet=dataclasses.replace(codec_cfg.seanet, causal=True))
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    params["head2_b"] = params["head2_b"].at[:, ts.eog].set(-1e9)
    codec_params = wm.init_wmencodec(jax.random.PRNGKey(1), codec_cfg)
    _ = np.asarray(params["head2_b"])
    log("params ready")

    MULT = max(2, (T + args.gen_frames) // 64)
    sx = (T + args.gen_frames) // MULT + 1
    dec = DecodeConfig(aug_text=True, cfg_stride=5, top_k=0, top_p=0.8,
                       stop_repetition=-1, cfg_pretrained=True,
                       max_gen_per_span=args.gen_frames + 8,
                       length_cap_mult=MULT)
    server = stream_mod.StreamingServer(params, cfg, dec, codec_params,
                                        codec_cfg, S, chunk_frames=25,
                                        sx_pad=256, p_pad=256)

    def make_req(seed):
        r = np.random.default_rng(seed)
        return (r.integers(0, cfg.text_vocab_size - 1, size=(sx,)),
                r.integers(0, ts.audio_vocab_size, size=(4, T)))

    # warm/compile
    server.run_online([make_req(1), make_req(2)], [0.0, 0.0],
                      rng=jax.random.PRNGKey(0))
    log(f"compiled; RSS {rss_mb():.0f} MB")

    deadline = time.monotonic() + args.minutes * 60 if args.minutes else None
    max_req = args.n_requests if not args.minutes else 10**9
    state = {"issued": 0, "done": 0}
    started = {}
    windows = []
    cur = {"ttfa": [], "lat": [], "t0": time.monotonic(), "rss0": rss_mb()}
    prepared_pool = [server.prepare_request(*make_req(100 + i))
                     for i in range(4 * S)]  # recycled shapes, no recompiles

    def poll():
        if state["issued"] >= max_req:
            return None
        if deadline and time.monotonic() > deadline:
            return None
        i = state["issued"]
        state["issued"] += 1
        started[i] = time.monotonic()
        return i, prepared_pool[i % len(prepared_pool)]

    firsts = {}

    def on_chunk(req_id, codes, wav, t):
        if req_id not in firsts:
            firsts[req_id] = time.monotonic()

    def on_done(req_id, codes, wav, first_at, t):
        now = time.monotonic()
        state["done"] += 1
        cur["ttfa"].append(firsts.get(req_id, now) - started.pop(req_id))
        cur["lat"].append(now - (firsts.get(req_id, now)))
        firsts.pop(req_id, None)
        if len(cur["ttfa"]) >= args.window:
            w = dict(n=state["done"], ttfa_p50=pctl(cur["ttfa"], 50),
                     ttfa_p95=pctl(cur["ttfa"], 95),
                     stream_s_p95=pctl(cur["lat"], 95),
                     rss_mb=round(rss_mb(), 1),
                     window_s=round(now - cur["t0"], 1))
            windows.append(w)
            log(json.dumps(w))
            cur["ttfa"], cur["lat"] = [], []
            cur["t0"] = now

    def should_stop():
        if deadline:
            return time.monotonic() > deadline and state["done"] >= state["issued"]
        return state["done"] >= max_req

    t_run = time.monotonic()
    server.serve_loop(poll, on_chunk=on_chunk, on_done=on_done,
                      rng=jax.random.PRNGKey(3), should_stop=should_stop)
    el = time.monotonic() - t_run

    srv = server._server
    leaked = [i for i, r in enumerate(srv._slot_req) if r is not None]
    active = int(np.asarray(srv.state.active).sum())
    first, last = (windows[0], windows[-1]) if len(windows) >= 2 else (None, None)
    out = dict(
        requests=state["done"], minutes=round(el / 60, 2), slots=S,
        agg_rtf=round(state["done"] * args.gen_frames / 50.0 / el, 2),
        windows=len(windows),
        rss_first_mb=first and first["rss_mb"], rss_last_mb=last and last["rss_mb"],
        rss_drift_mb=(last["rss_mb"] - first["rss_mb"]) if first else None,
        p95_first=first and first["ttfa_p95"], p95_last=last and last["ttfa_p95"],
        leaked_slots=leaked, active_rows_at_exit=active,
        ok=(not leaked) and active == 0,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
