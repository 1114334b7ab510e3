"""Multi-client streaming TTS on one TPU chip: per-request TTFA under load.

830M LM + full-geometry causal codec, 8 concurrent lanes, 25-frame (0.5 s)
emission chunks, 8 s utterances (400 frames, 3 s prompts). Phase 1 saturates
all lanes to measure aggregate capacity; phase 2 replays Poisson arrivals at
~60% of that capacity and reports the TTFA distribution (VERDICT r2 item 4
bar: p95 TTFA < 1 s at 8 lanes at ~60% capacity).
"""
import dataclasses, time, sys
t00 = time.time()
def log(m): print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, '/root/repo')
from ssr_speech_tpu.config import CodecConfig, DecodeConfig, SSRModelConfig
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.models.codec import wmencodec as wm
from ssr_speech_tpu.inference import stream as stream_mod

S = 8
FRAMES = 400  # 8 s at 50 Hz
T = 150       # 3 s prompt
cfg = SSRModelConfig(d_model=2048, nhead=16, num_layers=16, n_codebooks=4,
                     text_vocab_size=120)
ts = cfg.tokens
codec_cfg = CodecConfig()
codec_cfg = dataclasses.replace(
    codec_cfg, seanet=dataclasses.replace(codec_cfg.seanet, causal=True))
params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
params["head2_b"] = params["head2_b"].at[:, ts.eog].set(-1e9)
codec_params = wm.init_wmencodec(jax.random.PRNGKey(1), codec_cfg)
_ = np.asarray(params["head2_b"]); log("params ready")

rng = np.random.default_rng(0)
MULT = 4
sx = (T + FRAMES) // MULT + 1
def make_req(seed):
    r = np.random.default_rng(seed)
    return (r.integers(0, cfg.text_vocab_size - 1, size=(sx,)),
            r.integers(0, ts.audio_vocab_size, size=(4, T)))

dec = DecodeConfig(aug_text=True, cfg_stride=5, top_k=0, top_p=0.8,
                   stop_repetition=-1, cfg_pretrained=True,
                   max_gen_per_span=FRAMES + 8, length_cap_mult=MULT)
server = stream_mod.StreamingServer(params, cfg, dec, codec_params,
                                    codec_cfg, S, chunk_frames=25,
                                    sx_pad=256, p_pad=256)

# warm/compile: 2 lanes' worth through the full path
_ = server.run_online([make_req(1), make_req(2)], [0.0, 0.0],
                      rng=jax.random.PRNGKey(0))
log("compiled (warm run done)")

# phase 1: capacity — S simultaneous requests, all lanes saturated
reqs = [make_req(10 + i) for i in range(S)]
t0 = time.time()
res, first, done = server.run_online(reqs, [0.0] * S,
                                     rng=jax.random.PRNGKey(1))
el = time.time() - t0
frames_total = sum(r[0].shape[1] for r in res)
cap_fps = frames_total / el  # aggregate final frames/s at full load
cap_rps = cap_fps / FRAMES
log(f"capacity: {frames_total} frames in {el:.2f}s -> "
    f"{cap_fps:.0f} frames/s aggregate ({cap_fps/50:.1f}x RT), "
    f"{cap_rps:.2f} req/s")

# phase 2: Poisson arrivals at 60% capacity, eager prefill A/B (staging the
# next arrived request's prefill behind the in-flight LM chunk vs prefilling
# only when a lane frees)
N = 24
lam = 0.6 * cap_rps
gaps = np.random.default_rng(7).exponential(1.0 / lam, size=N)
arrivals = np.concatenate([[0.0], np.cumsum(gaps)[:-1]])
reqs = [make_req(100 + i) for i in range(N)]
for eager in (0, 1, 0, 1):  # alternate to cancel drift; best-of per arm
    t0 = time.time()
    res, first, done = server.run_online(reqs, list(arrivals),
                                         rng=jax.random.PRNGKey(2),
                                         eager_prefill=eager)
    el = time.time() - t0
    ttfa = np.array([f - a for f, a in zip(first, arrivals)])
    lat = np.array([d - a for d, a in zip(done, arrivals)])
    frames_total = sum(r[0].shape[1] for r in res)
    log(f"online eager={eager}: {N} reqs in {el:.1f}s at lambda={lam:.2f}/s "
        f"(60% cap); {frames_total/50:.0f}s audio -> "
        f"{frames_total/50/el:.1f}x RT agg")
    log(f"  TTFA ms: p50 {np.percentile(ttfa,50)*1e3:.0f} "
        f"p95 {np.percentile(ttfa,95)*1e3:.0f} max {ttfa.max()*1e3:.0f}")
    log(f"  completion s: p50 {np.percentile(lat,50):.2f} "
        f"p95 {np.percentile(lat,95):.2f}")
