"""Isolate continuous-batching overheads: per-step cost (paged step, full-size
cache) vs chunk-exit/refill cost.

A: serve 8 reqs on 8 slots (no refills) vs static generate_multi on same 8.
B: serve 16 reqs on 8 slots (8 refills) to price the exit+prefill+splice path.
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
MULT = 4
def mk(gen):
    T = 150
    sx = (T + gen) // MULT + 1
    x = rng.integers(0, cfg.text_vocab_size - 1, size=(sx,))
    y = rng.integers(0, ts.audio_vocab_size, size=(4, T))
    return (x, y, [(T, T)])

# fixed identical lengths: isolates per-step cost (no straggler effect)
reqs8 = [mk(300) for _ in range(8)]
dec = DecodeConfig(aug_text=True, cfg_stride=5, top_k=0, top_p=0.8,
                   stop_repetition=-1, cfg_pretrained=True,
                   max_gen_per_span=520, length_cap_mult=MULT)

server = serve_mod.ContinuousBatcher(params, cfg, dec, 8, sx_pad=128,
                                     p_pad=256, num_task=1)
_ = server.run(reqs8, jax.random.PRNGKey(0))
log("serve compiled")
t0 = time.time(); _ = server.run(reqs8, jax.random.PRNGKey(1)); elA = time.time()-t0
log(f"A serve 8/8 slots (no refill): {elA:.2f}s -> {elA/300*1000:.2f} ms/step")

_ = dec_mod.generate_multi(params, cfg, dec, reqs8, jax.random.PRNGKey(0))
log("static compiled")
t0 = time.time(); _ = dec_mod.generate_multi(params, cfg, dec, reqs8, jax.random.PRNGKey(1)); elB = time.time()-t0
log(f"A' static same 8: {elB:.2f}s -> {elB/300*1000:.2f} ms/step")

reqs16 = [mk(300) for _ in range(16)]
t0 = time.time(); _ = server.run(reqs16, jax.random.PRNGKey(1)); elC = time.time()-t0
log(f"B serve 16/8 slots (8 refills): {elC:.2f}s "
    f"(2x no-refill would be {2*elA:.2f}s; refill overhead "
    f"{(elC-2*elA)/8*1000:.0f} ms each)")
