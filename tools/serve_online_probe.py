"""ONLINE serving: request latency under Poisson arrivals on one TPU chip.

Continuous batching (run_online: arrivals splice into free lanes within a
64-step admission budget) vs the static batcher's best online strategy
(collect whatever has arrived, pad to S, decode the batch to completion).
Same 830M model, same varied-length workload, same arrival trace.
"""
import time, sys
t00 = time.time()
def log(m): print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, '/root/repo')
from ssr_speech_tpu.config import SSRModelConfig, DecodeConfig
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.inference import decode as dec_mod
from ssr_speech_tpu.inference import serve as serve_mod

cfg = SSRModelConfig(d_model=2048, nhead=16, num_layers=16, n_codebooks=4,
                     text_vocab_size=120)
ts = cfg.tokens
params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
params["head2_b"] = params["head2_b"].at[:, ts.eog].set(-1e9)
_ = np.asarray(params["head2_b"]); log("params ready")

rng = np.random.default_rng(0)
N, S = 24, 8
MULT = 4
reqs, gens = [], []
for i in range(N):
    gen = int(rng.integers(100, 500))
    T = int(rng.integers(120, 180))
    sx = (T + gen) // MULT + 1
    x = rng.integers(0, cfg.text_vocab_size - 1, size=(sx,))
    y = rng.integers(0, ts.audio_vocab_size, size=(4, T))
    reqs.append((x, y, [(T, T)]))
    gens.append(gen)
# Poisson arrivals at ~60% of the measured static offline capacity (17x):
# mean request audio 6 s -> service capacity ~2.8 req/s -> lambda 1.7 req/s
arr = np.cumsum(rng.exponential(0.6, size=N))
arr[0] = 0.0
log(f"workload: N={N}, gen 100..500 frames, arrivals over {arr[-1]:.1f}s")

dec = DecodeConfig(aug_text=True, cfg_stride=5, top_k=0, top_p=0.8,
                   stop_repetition=-1, cfg_pretrained=True,
                   max_gen_per_span=520, length_cap_mult=MULT)
sx_max = max(len(r[0]) for r in reqs)
p_max = max(r[1].shape[1] + 3 for r in reqs)
SX_PAD = dec_mod._bucket(sx_max, 64)
P_PAD = dec_mod._bucket(p_max, 128)

# ---- continuous online
server = serve_mod.ContinuousBatcher(params, cfg, dec, S, sx_pad=SX_PAD,
                                     p_pad=P_PAD, num_task=1)
_ = server.run(reqs[:S], jax.random.PRNGKey(0))  # warm/compile
_, _ = server.run_online(reqs[:2], [0.0, 0.0], jax.random.PRNGKey(0))
log("continuous compiled")
res, done_at = server.run_online(reqs, list(arr), jax.random.PRNGKey(1))
lat_c = np.array(done_at) - arr
log(f"continuous online: mean latency {lat_c.mean():.2f}s, "
    f"p95 {np.percentile(lat_c, 95):.2f}s, makespan {max(done_at):.1f}s")

# ---- static online baseline: batch whatever has arrived (padded to S)
def static_online():
    t0 = time.time()
    pending = list(range(N))
    lat = np.zeros(N)
    while pending:
        now = time.time() - t0
        arrived = [i for i in pending if arr[i] <= now]
        if not arrived:
            time.sleep(arr[pending[0]] - now)
            continue
        batch = arrived[:S]
        idxs = batch + [batch[-1]] * (S - len(batch))  # pad: one program
        _ = dec_mod.generate_multi(params, cfg, dec, [reqs[i] for i in idxs],
                                   jax.random.PRNGKey(1))
        now = time.time() - t0
        for i in batch:
            lat[i] = now - arr[i]
            pending.remove(i)
    return lat, time.time() - t0

_ = dec_mod.generate_multi(params, cfg, dec, [reqs[0]] * S,
                           jax.random.PRNGKey(0))
log("static compiled")
lat_s, mk = static_online()
log(f"static online:     mean latency {lat_s.mean():.2f}s, "
    f"p95 {np.percentile(lat_s, 95):.2f}s, makespan {mk:.1f}s")
log(f"continuous latency advantage: mean {lat_s.mean()/lat_c.mean():.2f}x, "
    f"p95 {np.percentile(lat_s,95)/np.percentile(lat_c,95):.2f}x")
