import time, sys
import jax, jax.numpy as jnp, numpy as np
rng = np.random.default_rng(0)
# per-iteration: one [2,2048]x[2048,2048] matmul (8.4MB weights)
w = jnp.asarray(rng.normal(size=(2048,2048), scale=0.02), jnp.bfloat16)
x = jnp.asarray(rng.normal(size=(2,2048)), jnp.bfloat16)

@jax.jit
def loop(x, w, n):
    def body(c):
        i, h = c
        return i+1, jnp.tanh(h @ w)
    _, h = jax.lax.while_loop(lambda c: c[0] < n, body, (0, x))
    return h

def run(n):
    r = loop(x, w, n); _ = np.asarray(r)
    t0=time.time()
    for _ in range(3):
        r = loop(x, w, n)
    _ = np.asarray(r)
    return (time.time()-t0)/3

t100 = run(100); t400 = run(400)
per_iter = (t400-t100)/300*1e6
print(f"100 iters: {t100*1e3:.1f} ms; 400 iters: {t400*1e3:.1f} ms -> {per_iter:.1f} us/iter (1 matmul 8.4MB)", flush=True)

# now with 16 matmuls per iteration (~134MB)
ws = jnp.asarray(rng.normal(size=(16,2048,2048), scale=0.02), jnp.bfloat16)
@jax.jit
def loop16(x, ws, n):
    def body(c):
        i, h = c
        for l in range(16):
            h = jnp.tanh(h @ ws[l])
        return i+1, h
    _, h = jax.lax.while_loop(lambda c: c[0] < n, body, (0, x))
    return h
def run16(n):
    r = loop16(x, ws, n); _ = np.asarray(r)
    t0=time.time()
    for _ in range(3):
        r = loop16(x, ws, n)
    _ = np.asarray(r)
    return (time.time()-t0)/3
t100 = run16(100); t400 = run16(400)
per_iter = (t400-t100)/300*1e6
print(f"16-matmul body: {per_iter:.1f} us/iter for 134MB -> {134e6/(per_iter*1e-6)/1e9:.0f} GB/s", flush=True)
