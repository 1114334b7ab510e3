import time, sys, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
rng = np.random.default_rng(0)
D, F = 2048, 8192
wq_np = rng.integers(-127,127,size=(D,F)).astype(np.int8)
wq = jnp.asarray(wq_np); s = jnp.asarray(np.abs(rng.normal(size=(1,F))).astype(np.float32)*0.01)
x = jnp.asarray(rng.normal(size=(2, D)), jnp.bfloat16)

def make(block_n, mode):
    def kern(x_ref, w_ref, s_ref, o_ref):
        if mode == "bf16":
            w = w_ref[:].astype(jnp.bfloat16)
            y = jax.lax.dot_general(x_ref[:], w, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
        elif mode == "int8":
            xq = jnp.clip(jnp.round(x_ref[:].astype(jnp.float32)*32.0), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(xq, w_ref[:], (((1,),(0,)),((),())), preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (1.0/32.0)
        o_ref[:] = (y * s_ref[:]).astype(o_ref.dtype)
    @jax.jit
    def f(x, wq, s):
        h = x
        for _ in range(16):
            y = pl.pallas_call(kern,
                out_shape=jax.ShapeDtypeStruct((2, F), jnp.bfloat16),
                grid=(F//block_n,),
                in_specs=[pl.BlockSpec((2, D), lambda i: (0,0), memory_space=pltpu.VMEM),
                          pl.BlockSpec((D, block_n), lambda i: (0,i), memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, block_n), lambda i: (0,i), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((2, block_n), lambda i: (0,i), memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
            )(h, wq, s)
            h = y[:, :D]
        return h
    return f

def bench(f, args, n=20):
    _ = np.asarray(f(*args))
    t0=time.time()
    for _ in range(n): r = f(*args)
    _ = np.asarray(r)
    return (time.time()-t0)/n*1000

mb = 16*D*F/1e6
for mode in ["bf16","int8"]:
    for bn in [512, 1024, 2048]:
        t = bench(make(bn, mode), (x, wq, s))
        print(f"mode={mode} block={bn}: {t:.2f} ms -> {mb/t:.0f} GB/s int8-effective", flush=True)
