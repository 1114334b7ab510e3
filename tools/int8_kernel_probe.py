"""Measure int8 pallas matvec bandwidth + per-call overhead on TPU."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0,'/root/repo')
import int8_matmul as m
rng = np.random.default_rng(0)
D, F = 2048, 8192
w = rng.normal(size=(D, F), scale=0.02).astype(np.float32)
wq, s = m.quantize_weight(jnp.asarray(w))
wq = jax.device_put(wq); s = jax.device_put(s)
x = jnp.asarray(rng.normal(size=(2, D)), jnp.bfloat16)
w_bf = jnp.asarray(w, jnp.bfloat16)

# chain of 16 to amortize dispatch: y depends on previous via first column trick
@jax.jit
def chain_pallas(x, wq, s):
    h = x
    for _ in range(16):
        y = m.int8_matmul(h, wq, s, block_n=512)   # [2, F]
        h = y[:, :D]  # feed back
    return h

@jax.jit
def chain_bf16(x, w_bf):
    h = x
    for _ in range(16):
        y = h @ w_bf
        h = y[:, :D]
    return h

def bench(f, args, n=20):
    _ = np.asarray(f(*args))
    t0=time.time()
    for _ in range(n): r = f(*args)
    _ = np.asarray(r)
    return (time.time()-t0)/n*1000

tb = bench(chain_bf16, (x, w_bf))
tp = bench(chain_pallas, (x, wq, s))
mb_bf = 16*D*F*2/1e6; mb_i8 = 16*D*F/1e6
print(f"bf16 xla   : {tb:.2f} ms for {mb_bf:.0f}MB -> {mb_bf/tb:.0f} GB/s", flush=True)
print(f"int8 pallas: {tp:.2f} ms for {mb_i8:.0f}MB -> {mb_i8/tp:.0f} GB/s (vs bf16 {tb/tp:.2f}x)", flush=True)
