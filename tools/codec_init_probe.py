"""Bisect codec-GAN init time (tools/codec_compile_probe.py measured 18 min
to 'state ready' while every train-step subgraph compiles in <35 s).  Times
each phase of `init_codec_train_state` separately on the TPU."""
import sys
import time

t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')
from ssr_speech_tpu.config import CodecConfig
from ssr_speech_tpu.models.codec import wmencodec as wm
from ssr_speech_tpu.training import codec_trainer
from ssr_speech_tpu.training import discriminators as disc_mod
from ssr_speech_tpu.training import losses as L

cfg = CodecConfig()
log(f"devices: {jax.devices()}")

t0 = time.time()
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
params = wm.init_wmencodec(k1, cfg)
jax.block_until_ready(params)
_ = np.asarray(params["quantizer"]["embed"][0][0, :1])  # force sync on axon
log(f"init_wmencodec: {time.time()-t0:.1f}s")

t0 = time.time()
disc_params = disc_mod.init_msstftd(k2)
_ = np.asarray(disc_params["subs"][0]["post"]["b"][:1]) \
    if "b" in disc_params["subs"][0]["post"] else jax.block_until_ready(disc_params)
log(f"init_msstftd: {time.time()-t0:.1f}s")

t0 = time.time()
g_opt_t, d_opt_t = codec_trainer.make_optimizers()
g_opt = g_opt_t.init(params["wmdecoder"])
jax.block_until_ready(g_opt)
log(f"g_opt.init (unjitted optax): {time.time()-t0:.1f}s")

t0 = time.time()
d_opt = d_opt_t.init(disc_params)
jax.block_until_ready(d_opt)
log(f"d_opt.init: {time.time()-t0:.1f}s")

t0 = time.time()
ema = jax.tree.map(jnp.copy, params["wmdecoder"])
jax.block_until_ready(ema)
log(f"ema copy (per-leaf dispatch): {time.time()-t0:.1f}s")

t0 = time.time()
bal = L.init_balancer(list(codec_trainer.BALANCE_WEIGHTS))
jax.block_until_ready(bal)
log(f"init_balancer: {time.time()-t0:.1f}s")

t0 = time.time()
host = jax.tree.map(np.asarray, dict(p=params, d=disc_params, g=g_opt,
                                     o=d_opt, e=ema))
n = sum(l.nbytes for l in jax.tree.leaves(host))
log(f"device->host pull of everything ({n/1e6:.0f} MB): {time.time()-t0:.1f}s")
