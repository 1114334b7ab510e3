import time, sys
t00=time.time()
def log(msg): print(f"[{time.time()-t00:7.1f}s] {msg}", flush=True)
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0,'/root/repo')
from ssr_speech_tpu.config import SSRModelConfig, DecodeConfig
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.inference import decode as dec_mod
from ssr_speech_tpu.ops import patterns
cfg = SSRModelConfig(d_model=2048, nhead=16, num_layers=16, n_codebooks=4, text_vocab_size=120)
ts = cfg.tokens
params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
params["head2_b"] = params["head2_b"].at[:, ts.eog].set(-1e9)
jax.block_until_ready(params["head2_b"]); log("params ready")
rng = np.random.default_rng(0)
x = rng.integers(0, cfg.text_vocab_size-1, size=(120,))
y = rng.integers(0, ts.audio_vocab_size, size=(4,150))
mask=[(150,150)]
frames=100
prefix, mp_, nt, nm = patterns.build_inference_prefix(y, mask, ts)
xb = np.stack([x, np.full_like(x, cfg.text_vocab_size-1)])
sent = np.arange(ts.mts, ts.mts+3, dtype=np.int32)

def run_case(name, top_p, top_k, tmax, aug):
    dec = DecodeConfig(aug_text=aug, cfg_stride=5, top_k=top_k, top_p=top_p, stop_repetition=-1,
                       cfg_pretrained=True, max_gen_per_span=frames+4, length_cap_mult=10000)
    xin = jnp.asarray(xb if aug else xb[:1])
    cache, kb = dec_mod._prefill_impl(params, xin, jnp.asarray(prefix), cfg=cfg, tmax=tmax, dtype_name="bfloat16", cfg_pretrained=True, aug_text=aug)
    out, se, ol = dec_mod._generate_impl(params, cache, kb, jax.random.PRNGKey(0), jnp.asarray(sent),
        cfg=cfg, dec=dec, num_task=1, x_len=120, cap_total=frames+4, aug_text=aug, dtype_name="bfloat16")
    jax.block_until_ready(out)
    t0=time.time()
    for s in range(2):
        cache, kb = dec_mod._prefill_impl(params, xin, jnp.asarray(prefix), cfg=cfg, tmax=tmax, dtype_name="bfloat16", cfg_pretrained=True, aug_text=aug)
        out, se, ol = dec_mod._generate_impl(params, cache, kb, jax.random.PRNGKey(s), jnp.asarray(sent),
            cfg=cfg, dec=dec, num_task=1, x_len=120, cap_total=frames+4, aug_text=aug, dtype_name="bfloat16")
        jax.block_until_ready(out)
    el=(time.time()-t0)/2
    log(f"{name}: {el:.3f}s/call -> {el/(frames+4)*1000:.2f} ms/step")

run_case("base  tp0.8 tmax2048 cfg", 0.8, 0, 2048, True)
run_case("nop   tp1.0 tmax2048 cfg", 1.0, 0, 2048, True)
run_case("topk1 tmax2048 cfg      ", 1.0, 1, 2048, True)
run_case("base  tp0.8 tmax768 cfg ", 0.8, 0, 768, True)
run_case("nocfg tp0.8 tmax768     ", 0.8, 0, 768, False)
run_case("nop   tmax768 nocfg     ", 1.0, 0, 768, False)
