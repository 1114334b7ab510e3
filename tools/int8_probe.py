"""Does XLA stream int8 weights at int8 bandwidth when converting to bf16
inside the matmul fusion? Decides the int8-decode implementation strategy."""
import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
D = 2048
N_W = 64
w_bf = jnp.asarray(rng.normal(size=(N_W, D, D), scale=0.02), jnp.bfloat16)
w_i8 = jnp.asarray(rng.integers(-127, 127, size=(N_W, D, D)), jnp.int8)
scale = jnp.asarray(np.abs(rng.normal(size=(N_W, D))) * 0.01, jnp.bfloat16)
x = jnp.asarray(rng.normal(size=(2, D)), jnp.bfloat16)


@jax.jit
def chain_bf(x, w_bf):
    # unrolled static slices, same structure as the decode step
    h = x
    for l in range(N_W):
        h = jax.nn.relu(h @ w_bf[l])
    return h


@jax.jit
def chain_i8(x, w_i8, scale):
    h = x
    for l in range(N_W):
        h = jax.nn.relu((h @ w_i8[l].astype(jnp.bfloat16)) * scale[l])
    return h


def bench(f, args, n=30):
    _ = np.asarray(f(*args))
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    _ = np.asarray(r)
    return (time.time() - t0) / n * 1000


tb = bench(chain_bf, (x, w_bf))
ti = bench(chain_i8, (x, w_i8, scale))
bytes_bf = N_W * D * D * 2
bytes_i8 = N_W * D * D * 1
print(f"bf16: {tb:.2f} ms for {bytes_bf/1e6:.0f}MB -> {bytes_bf/tb*1e-6:.0f} GB/s",
      flush=True)
print(f"int8: {ti:.2f} ms for {bytes_i8/1e6:.0f}MB -> {bytes_i8/ti*1e-6:.0f} GB/s "
      f"(speedup {tb/ti:.2f}x)", flush=True)
