"""Micro-probe: per-step cost of the paged decode step vs the shared-column
step at identical 830M geometry (B=16 rows, Tp=512, Tg=640)."""
import functools
import time, sys
t00 = time.time()
def log(m): print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, '/root/repo')
from ssr_speech_tpu.config import SSRModelConfig
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.models import transformer as trf

cfg = SSRModelConfig(d_model=2048, nhead=16, num_layers=16, n_codebooks=4,
                     text_vocab_size=120)
params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
dec_params = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                          params["decoder"])
import os
B = int(os.environ.get("PROBE_B", 16))
TP = int(os.environ.get("PROBE_TP", 512))
TG = int(os.environ.get("PROBE_TG", 640))
pfx = trf.KVCache(jnp.zeros((16, B, 16, TP, 128), jnp.bfloat16),
                  jnp.zeros((16, B, 16, TP, 128), jnp.bfloat16),
                  jnp.asarray(TP, jnp.int32))
def mk_carry():  # the whole carry is donated each run, so rebuild it
    gen = trf.KVCache(jnp.zeros((16, B, 16, TG, 128), jnp.bfloat16),
                      jnp.zeros((16, B, 16, TG, 128), jnp.bfloat16),
                      jnp.asarray(0, jnp.int32))
    return (jnp.ones((B, 2048), jnp.bfloat16), gen,
            jnp.full((B,), 100, jnp.int32))
N = 200


@functools.partial(jax.jit, static_argnames=("kind",), donate_argnums=(2,))
def run(dp, px, carry, *, kind):
    banned = jnp.zeros((B, TP), bool)

    def body(i, c):
        h, gen, gl = c
        if kind == "paged":
            out, gen = trf.transformer_decode_step_paged(
                dp, h, px, gen, banned, gl, cfg, dtype=jnp.bfloat16)
        else:
            out, gen = trf.transformer_decode_step_shared(
                dp, h, px, gen, banned, cfg, n_groups=B, dtype=jnp.bfloat16)
        return (out.astype(jnp.bfloat16), gen, gl + 1)

    return jax.lax.fori_loop(0, N, body, carry)


for kind in ["paged", "shared-full"]:
    c = run(dec_params, pfx, mk_carry(), kind=kind)
    _ = np.asarray(c[0])
    c = mk_carry()
    t0 = time.time()
    c = run(dec_params, pfx, c, kind=kind)
    _ = np.asarray(c[0])
    log(f"{kind}: {(time.time()-t0)/N*1000:.2f} ms/step (Tg={TG})")
