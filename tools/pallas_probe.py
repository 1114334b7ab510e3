import time, sys
t00=time.time()
def log(m): print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0,'/root/repo')
from ssr_speech_tpu.ops import decode_attention as da
# correctness on TPU
rng = np.random.default_rng(0)
B,H,T,Dh = 2,16,1024,128
q = jnp.asarray(rng.normal(size=(B,H,Dh)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B,H,T,Dh)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B,H,T,Dh)), jnp.bfloat16)
ban = jnp.asarray([[100,128],[1,128]], jnp.int32)
for pos in [130, 700]:
    got = np.asarray(da.decode_attention(q,k,v,jnp.asarray(pos,jnp.int32),ban).astype(jnp.float32))
    want = np.asarray(da.decode_attention_reference(q,k,v,jnp.asarray(pos),ban).astype(jnp.float32))
    print("pos",pos,"maxdiff",np.abs(got-want).max(), flush=True)
log("kernel correctness done")

from ssr_speech_tpu.config import SSRModelConfig, DecodeConfig
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.inference import decode as dec_mod
cfg = SSRModelConfig(d_model=2048, nhead=16, num_layers=16, n_codebooks=4, text_vocab_size=120)
ts = cfg.tokens
params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
params["head2_b"] = params["head2_b"].at[:, ts.eog].set(-1e9)
_ = np.asarray(params["head2_b"]); log("params ready")
x = rng.integers(0, cfg.text_vocab_size-1, size=(120,))
y = rng.integers(0, ts.audio_vocab_size, size=(4,150))
mask=[(150,150)]
frames=300
def run_case(name, tmax, pallas):
    dec = DecodeConfig(aug_text=True, cfg_stride=5, top_k=0, top_p=0.8, stop_repetition=-1,
                       cfg_pretrained=True, max_gen_per_span=frames+4, length_cap_mult=10000)
    def call(s):
        codes, marks, oi, nm = dec_mod.generate(params, cfg, dec, x, y, mask,
            jax.random.PRNGKey(s), tmax=tmax, dtype_name="bfloat16", use_pallas=pallas)
        return codes
    c = call(0)
    t0=time.time()
    for s in range(2): c = call(s+1)
    el=(time.time()-t0)/2
    log(f"{name}: {el:.3f}s/call -> {el/(frames+4)*1000:.2f} ms/step, lm RTF {frames/50/el:.1f}x")
run_case("xla    tmax1024", 1024, False)
run_case("pallas tmax1024", 1024, True)
run_case("xla    tmax2048", 2048, False)
run_case("pallas tmax2048", 2048, True)
