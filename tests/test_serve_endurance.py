"""Serving-engine endurance: StreamingServer.serve_loop over a long request
stream must not leak — lanes, queues, python heap, or process RSS.

The loop claims to run "indefinitely with no compaction"
(inference/stream.py paged lanes; inference/serve.py:19-20): these tests
bound that claim at tiny geometry on CPU. A 30-min real-TPU soak lives in
tools/endurance_probe.py; BENCHMARKS.md records its numbers.
"""

import gc
import os
import tracemalloc
from collections import deque

import jax
import numpy as np
import pytest

from ssr_speech_tpu.config import (
    CodecConfig, DecodeConfig, RVQConfig, SEANetConfig, tiny_ssr_config,
)
from ssr_speech_tpu.inference import stream
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.models.codec import wmencodec as wm

CFG = tiny_ssr_config()
CODEC = CodecConfig(
    seanet=SEANetConfig(dimension=16, n_filters=2, n_residual_layers=1,
                        ratios=(4, 2), lstm=1, norm="weight_norm",
                        causal=True, pad_mode="constant"),
    rvq=RVQConfig(dimension=16, n_q=CFG.n_codebooks,
                  bins=CFG.tokens.audio_vocab_size),
)


def _rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 2**20


def _requests(n, rng):
    """A few recycled shapes (static buckets -> no per-request recompiles)."""
    ts = CFG.tokens
    shapes = [(24, 40), (17, 28), (30, 36)]
    reqs = []
    for i in range(n):
        T, sx = shapes[i % len(shapes)]
        y = rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, T))
        x = rng.integers(0, CFG.text_vocab_size - 1, size=(sx,))
        reqs.append((x, y))
    return reqs


@pytest.mark.slow
def test_serve_loop_endurance_no_leaks():
    lm = ssr_model.init_ssr(jax.random.PRNGKey(0), CFG)
    codec = wm.init_wmencodec(jax.random.PRNGKey(1), CODEC)
    dec_cfg = DecodeConfig(top_k=1, top_p=1.0, stop_repetition=-1,
                           cfg_coef=1.5, cfg_stride=2, aug_text=True,
                           cfg_pretrained=True, max_gen_per_span=60,
                           length_cap_mult=10)
    server = stream.StreamingServer(lm, CFG, dec_cfg, codec, CODEC, 2,
                                    chunk_frames=10, sx_pad=64, p_pad=64,
                                    dtype_name="float32", warm_chunk=8)
    rng = np.random.default_rng(5)
    N_WARM, N_TOTAL = 40, 140
    reqs = _requests(N_TOTAL, rng)
    pending = deque((i, server.prepare_request(x, y)) for i, (x, y) in
                    enumerate(reqs))
    done = {}
    marks = {}

    def poll():
        return pending.popleft() if pending else None

    def on_done(req_id, codes, wav, first_at, t):
        done[req_id] = (codes.shape, wav.shape)
        if len(done) == N_WARM:
            gc.collect()
            tracemalloc.start()
            marks["snap0"] = tracemalloc.take_snapshot()
            marks["rss0"] = _rss_mb()

    server.serve_loop(poll, on_done=on_done, rng=jax.random.PRNGKey(0),
                      should_stop=lambda: len(done) >= N_TOTAL)

    assert len(done) == N_TOTAL
    # every request produced audio
    assert all(cs[1] > 0 and ws[0] > 0 for cs, ws in done.values())

    # ---- leak bounds: steady state established after the warm N_WARM ----
    gc.collect()
    snap1 = tracemalloc.take_snapshot()
    growth = sum(st.size_diff for st in
                 snap1.compare_to(marks["snap0"], "lineno"))
    tracemalloc.stop()
    rss1 = _rss_mb()
    # python-heap growth over 100 further requests stays < 4 MB (results
    # dict aside, every per-request structure must have been freed)
    assert growth < 4 * 2**20, f"python heap grew {growth/2**20:.2f} MB"
    assert rss1 - marks["rss0"] < 64, (
        f"RSS grew {rss1 - marks['rss0']:.1f} MB over 100 requests")

    # ---- structural: every lane/slot/queue is free at exit ----
    srv = server._server
    assert all(r is None for r in srv._slot_req)
    assert not np.asarray(srv.state.active).any()


@pytest.mark.slow
def test_serve_loop_interleaved_refill_results_stable():
    """Late-arriving work (poll returns None, then more requests) resumes
    cleanly after idle; outputs for identical requests are identical across
    early and late phases (no state bleed between occupancies)."""
    lm = ssr_model.init_ssr(jax.random.PRNGKey(0), CFG)
    codec = wm.init_wmencodec(jax.random.PRNGKey(1), CODEC)
    dec_cfg = DecodeConfig(top_k=1, top_p=1.0, stop_repetition=-1,
                           cfg_coef=1.5, cfg_stride=2, aug_text=True,
                           cfg_pretrained=True, max_gen_per_span=60,
                           length_cap_mult=10)
    server = stream.StreamingServer(lm, CFG, dec_cfg, codec, CODEC, 2,
                                    chunk_frames=10, sx_pad=64, p_pad=64,
                                    dtype_name="float32", warm_chunk=8)
    rng = np.random.default_rng(9)
    base = _requests(3, rng)
    # phase 1: ids 0..2 ; idle gap ; phase 2: same requests as ids 10..12
    schedule = deque([(i, server.prepare_request(x, y))
                      for i, (x, y) in enumerate(base)])
    late = [(10 + i, server.prepare_request(x, y))
            for i, (x, y) in enumerate(base)]
    done = {}
    state = {"idled": 0}

    def poll():
        if schedule:
            return schedule.popleft()
        return None

    def on_idle(now):
        state["idled"] += 1
        if len(done) >= 3 and late:
            schedule.extend(late)
            late.clear()

    def on_done(req_id, codes, wav, first_at, t):
        done[req_id] = (codes, wav)

    server.serve_loop(poll, on_done=on_done, rng=jax.random.PRNGKey(0),
                      should_stop=lambda: len(done) >= 6, on_idle=on_idle)
    assert sorted(done) == [0, 1, 2, 10, 11, 12]
    for i in range(3):
        c0, w0 = done[i]
        c1, w1 = done[10 + i]
        np.testing.assert_array_equal(c0, c1)
        np.testing.assert_allclose(w0, w1, atol=2e-5, rtol=1e-4)
