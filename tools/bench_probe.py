import time, sys
t00=time.time()
def log(msg): print(f"[{time.time()-t00:7.1f}s] {msg}", flush=True)
import jax, jax.numpy as jnp, numpy as np
log(f"jax loaded, devices={jax.devices()}")
sys.path.insert(0,'/root/repo')
from ssr_speech_tpu.config import SSRModelConfig, DecodeConfig
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.inference import decode as dec_mod
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
frames=100  # 2s for probing
dec = DecodeConfig(aug_text=True, cfg_stride=5, top_k=0, top_p=0.8, stop_repetition=-1,
                   cfg_pretrained=True, max_gen_per_span=frames+4, length_cap_mult=10000)
from ssr_speech_tpu.ops import patterns
prefix, mp_, nt, nm = patterns.build_inference_prefix(y, mask, ts)
log(f"prefix built P={prefix.shape[1]}")
xb = np.stack([x, np.full_like(x, cfg.text_vocab_size-1)])
tmax = 2048
t0=time.time()
cache, kb = dec_mod._prefill_impl(params, jnp.asarray(xb), jnp.asarray(prefix), cfg=cfg, tmax=tmax, dtype_name="bfloat16", cfg_pretrained=True, aug_text=True)
jax.block_until_ready(cache.k); log(f"prefill compile+run {time.time()-t0:.1f}s")
t0=time.time()
sent = np.arange(ts.mts, ts.mts+3, dtype=np.int32)
out, se, ol = dec_mod._generate_impl(params, cache, kb, jax.random.PRNGKey(0), jnp.asarray(sent),
    cfg=cfg, dec=dec, num_task=1, x_len=120, cap_total=frames+4, aug_text=True, dtype_name="bfloat16")
jax.block_until_ready(out); log(f"generate compile+run {time.time()-t0:.1f}s (steps={int(ol)})")
t0=time.time()
cache, kb = dec_mod._prefill_impl(params, jnp.asarray(xb), jnp.asarray(prefix), cfg=cfg, tmax=tmax, dtype_name="bfloat16", cfg_pretrained=True, aug_text=True)
out, se, ol = dec_mod._generate_impl(params, cache, kb, jax.random.PRNGKey(1), jnp.asarray(sent),
    cfg=cfg, dec=dec, num_task=1, x_len=120, cap_total=frames+4, aug_text=True, dtype_name="bfloat16")
jax.block_until_ready(out); el=time.time()-t0
log(f"cached run {el:.2f}s -> per-step {(el)/(frames+4)*1000:.2f} ms, RTF(lm only) {frames/50/el:.1f}x")
