import time, sys
t00=time.time()
def log(m): print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0,'/root/repo')
from ssr_speech_tpu.config import SSRModelConfig, DecodeConfig
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.inference import decode as dec_mod
cfg = SSRModelConfig(d_model=2048, nhead=16, num_layers=16, n_codebooks=4, text_vocab_size=120)
ts = cfg.tokens
params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
params["head2_b"] = params["head2_b"].at[:, ts.eog].set(-1e9)
_ = np.asarray(params["head2_b"]); log("params ready")
rng = np.random.default_rng(0)
x = rng.integers(0, cfg.text_vocab_size-1, size=(120,))
y = rng.integers(0, ts.audio_vocab_size, size=(4,150))
mask=[(150,150)]
frames=300
dec = DecodeConfig(aug_text=True, cfg_stride=5, top_k=0, top_p=0.8, stop_repetition=-1,
                   cfg_pretrained=True, max_gen_per_span=frames+4, length_cap_mult=10000)
for S in [1, 2, 4, 8, 16]:
    def call(s):
        return dec_mod.generate_batch(params, cfg, dec, x, y, mask,
            jax.random.PRNGKey(s), n_samples=S, tmax=1024,
            dtype_name="bfloat16")
    r = call(0)
    t0=time.time()
    for s in range(2): r = call(s+1)
    el=(time.time()-t0)/2
    log(f"S={S}: {el:.3f}s/call -> {el/(frames+4)*1000:.2f} ms/step, "
        f"aggregate RTF {S*frames/50/el:.1f}x")
