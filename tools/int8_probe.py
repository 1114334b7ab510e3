import time, sys
import jax, jax.numpy as jnp, numpy as np
rng = np.random.default_rng(0)
D = 2048
N_W = 64
w_bf = jnp.asarray(rng.normal(size=(N_W, D, D), scale=0.02), jnp.bfloat16)
w_i8 = jnp.asarray(rng.integers(-127,127,size=(N_W, D, D)), jnp.int8)
scale = jnp.asarray(rng.normal(size=(N_W, D)), jnp.bfloat16) * 0.01
x = jnp.asarray(rng.normal(size=(2, D)), jnp.bfloat16)

@jax.jit
def chain_bf(x):
    def body(h, w):
        return jax.nn.relu(h @ w), None
    h, _ = jax.lax.scan(body, x, w_bf)
    return h

@jax.jit
def chain_i8(x):
    def body(h, wv):
        w, s = wv
        return jax.nn.relu((h @ w.astype(jnp.bfloat16)) * s), None
    h, _ = jax.lax.scan(body, x, (w_i8, scale))
    return h

def bench(f, n=30):
    _ = np.asarray(f(x))
    t0=time.time()
    for _ in range(n):
        r = f(x)
    _ = np.asarray(r)
    return (time.time()-t0)/n*1000

tb = bench(chain_bf)
ti = bench(chain_i8)
bytes_bf = N_W*D*D*2
bytes_i8 = N_W*D*D*1
print(f"bf16: {tb:.2f} ms for {bytes_bf/1e6:.0f}MB -> {bytes_bf/tb*1e-6:.0f} GB/s", flush=True)
print(f"int8: {ti:.2f} ms for {bytes_i8/1e6:.0f}MB -> {bytes_i8/ti*1e-6:.0f} GB/s", flush=True)
