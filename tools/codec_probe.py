"""Full-geometry wmencodec encode/decode throughput on one TPU chip."""
import sys, time
t00 = time.time()
def log(m): print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from ssr_speech_tpu.config import CodecConfig
from ssr_speech_tpu.models.codec import wmencodec as wm

cfg = CodecConfig()
params = wm.init_wmencodec(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
rng = np.random.default_rng(0)
B, sec = 16, 10
T = sec * cfg.sample_rate
wav = jnp.asarray((rng.normal(size=(B, T, 1)) * 0.1).astype(np.float32))
enc = jax.jit(lambda w: wm.encode(params, w, cfg)[0])
codes = enc(wav); _ = np.asarray(codes); log("encode compiled")
t0 = time.time(); n = 5
for _ in range(n): _ = np.asarray(enc(wav))
el = (time.time() - t0) / n
log(f"encode: {el*1000:.1f} ms for {B*sec}s audio -> {B*sec/el:.0f}x realtime")
dec = jax.jit(lambda c: wm.decode(params, c, cfg))
out = dec(codes); _ = np.asarray(out); log("decode compiled")
t0 = time.time()
for _ in range(n): _ = np.asarray(dec(codes))
el = (time.time() - t0) / n
log(f"decode: {el*1000:.1f} ms for {B*sec}s audio -> {B*sec/el:.0f}x realtime")
wavz = jnp.zeros((B, T, 1), jnp.float32)
labels = jnp.asarray(rng.integers(0, 2, size=(B, T // cfg.hop_length)), jnp.int32)
wmd = jax.jit(lambda c, l, w: wm.wmdecode(params, c, l, w, cfg)[0])
out = wmd(codes, labels, wavz); _ = np.asarray(out); log("wmdecode compiled")
t0 = time.time()
for _ in range(n): _ = np.asarray(wmd(codes, labels, wavz))
el = (time.time() - t0) / n
log(f"wmdecode: {el*1000:.1f} ms for {B*sec}s audio -> {B*sec/el:.0f}x realtime")
