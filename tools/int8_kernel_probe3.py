"""Megakernel-style probe: 16 chained matvecs in ONE pallas call.
Grid (16 layers x N-tiles); h carried in VMEM scratch across grid steps."""
import time, sys, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
rng = np.random.default_rng(0)
D, F = 2048, 8192
L = 16
BN = 512
wq = jnp.asarray(rng.integers(-127,127,size=(L,D,F)).astype(np.int8))
s = jnp.asarray(np.abs(rng.normal(size=(L,1,F))).astype(np.float32)*0.01)
x = jnp.asarray(rng.normal(size=(8, D)), jnp.bfloat16)  # 8 rows (sublane-friendly)

def kern(x_ref, w_ref, s_ref, o_ref, h_scr, acc_scr):
    l = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((l == 0) & (j == 0))
    def _():
        h_scr[:] = x_ref[:].astype(jnp.float32)

    w = w_ref[:].astype(jnp.bfloat16)  # [D, BN] dequant
    y = jax.lax.dot_general(h_scr[:].astype(jnp.bfloat16), w,
                            (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
    acc_scr[:, pl.ds(j * BN, BN)] = y * s_ref[:]

    @pl.when(j == (F//BN) - 1)
    def _():
        # feed first D cols back as next layer's input
        h_scr[:] = acc_scr[:, :D]
        o_ref[:] = acc_scr[:, :D].astype(jnp.bfloat16)

@jax.jit
def mega(x, wq, s):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, D), jnp.bfloat16),
        grid=(L, F//BN),
        in_specs=[pl.BlockSpec((8, D), lambda l, j: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, D, BN), lambda l, j: (l, 0, j), memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, 1, BN), lambda l, j: (l, 0, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, D), lambda l, j: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, D), jnp.float32),
                        pltpu.VMEM((8, F), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110*1024*1024),
    )(x, wq, s)

def kern2(x_ref, w_ref, s_ref, o_ref, h_scr, acc_scr):
    # identical but weight block squeezed differently is handled by pallas
    pass

def bench(f, args, n=20):
    _ = np.asarray(f(*args))
    t0=time.time()
    for _ in range(n): r = f(*args)
    _ = np.asarray(r)
    return (time.time()-t0)/n*1000

t = bench(mega, (x, wq, s))
mb = L*D*F/1e6
print(f"megakernel: {t:.2f} ms for {mb:.0f}MB int8 -> {mb/t:.0f} GB/s", flush=True)
