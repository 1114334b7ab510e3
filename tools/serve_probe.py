"""Continuous batching vs static multi-prompt batching on one TPU chip.

Workload: N requests with VARIED target lengths (the serving regime where
static batching idles on the tail straggler). Lengths are controlled via the
per-request length cap (x_len * length_cap_mult) with EOG banned, so random
weights produce deterministic, varied chain lengths.
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
N, S = 32, 8
MULT = 4
reqs, target_frames = [], []
for i in range(N):
    # target generation length 100..500 frames via the length cap
    gen = int(rng.integers(100, 500))
    T = int(rng.integers(120, 180))          # prompt frames
    sx = (T + gen) // MULT + 1               # x_len so cap = T + gen
    x = rng.integers(0, cfg.text_vocab_size - 1, size=(sx,))
    y = rng.integers(0, ts.audio_vocab_size, size=(4, T))
    reqs.append((x, y, [(T, T)]))
    target_frames.append(gen)
log(f"workload: N={N} gen lengths {min(target_frames)}..{max(target_frames)}"
    f" (mean {np.mean(target_frames):.0f})")

dec = DecodeConfig(aug_text=True, cfg_stride=5, top_k=0, top_p=0.8,
                   stop_repetition=-1, cfg_pretrained=True,
                   max_gen_per_span=520, length_cap_mult=MULT)

# ---- continuous batching
sx_max = max(len(r[0]) for r in reqs)
p_max = max(r[1].shape[1] + 3 for r in reqs)  # prefix adds sentinel cols
server = serve_mod.ContinuousBatcher(
    params, cfg, dec, S, sx_pad=dec_mod._bucket(sx_max, 64),
    p_pad=dec_mod._bucket(p_max, 128), num_task=1)
r = server.run(reqs[:S], jax.random.PRNGKey(0))   # compile + warm
log("server compiled (warm run done)")
t0 = time.time()
marks = []  # (elapsed, n_done) after each harvest round
res = server.run(reqs, jax.random.PRNGKey(1),
                 progress=lambda d, t, st: marks.append((time.time()-t0, d)))
el_cont = time.time() - t0
# mean completion time: requests finished between two marks completed at the
# later mark's timestamp
mct_c, prev = 0.0, 0
for el, d in marks:
    mct_c += (d - prev) * el; prev = d
mct_c /= N
log(f"continuous: {el_cont:.2f}s for {N} reqs, "
    f"aggregate RTF {sum(target_frames)/50/el_cont:.1f}x, "
    f"mean completion {mct_c:.2f}s")

# ---- static batching baseline: N/S batches of S (same compiled loop reused)
def static_all():
    out = []
    for b in range(N // S):
        out += dec_mod.generate_multi(params, cfg, dec, reqs[b*S:(b+1)*S],
                                      jax.random.PRNGKey(1))
    return out
_ = static_all()  # warm every pad-bucket geometry
log("static compiled")
t0 = time.time()
mct_s = 0.0
for b in range(N // S):
    _ = dec_mod.generate_multi(params, cfg, dec, reqs[b*S:(b+1)*S],
                               jax.random.PRNGKey(1))
    mct_s += S * (time.time() - t0)
el_stat = time.time() - t0
mct_s /= N
log(f"static S={S}: {el_stat:.2f}s, "
    f"aggregate RTF {sum(target_frames)/50/el_stat:.1f}x, "
    f"mean completion {mct_s:.2f}s")
log(f"continuous/static: throughput {el_stat/el_cont:.2f}x, "
    f"mean-completion {mct_s/mct_c:.2f}x better")

# ---- static batching with shortest-job scheduling (offline throughput)
batches = serve_mod.sorted_static_batches(reqs, S)
def static_sorted(collect_mct=False):
    out = [None]*N
    t0 = time.time(); mct = 0.0
    for b in batches:
        rs = dec_mod.generate_multi(params, cfg, dec, [reqs[i] for i in b],
                                    jax.random.PRNGKey(1))
        mct += len(b) * (time.time() - t0)
        for i, r in zip(b, rs):
            out[i] = r
    return out, time.time() - t0, mct / N
_ = static_sorted()  # warm sorted-batch geometries
res_ss, el_ss, mct_ss = static_sorted()
log(f"static sorted S={S}: {el_ss:.2f}s, "
    f"aggregate RTF {sum(target_frames)/50/el_ss:.1f}x, "
    f"mean completion {mct_ss:.2f}s")
