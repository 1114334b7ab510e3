"""Flash-attention kernel block-size sweep at the production train geometry.

B=4, H=16, S padded to 1280, Dh=128 (the 830M step's attention shape). The
padded length 1280 admits block sizes {128, 256, 640, 1280}; the shipped
dispatch picks the largest of (512, 256, 128) that divides it -> 256. This
probe times fwd and fwd+bwd for each admissible block to check whether 640
(fewer grid steps) or a fwd/bwd split choice beats it.

Usage: python tools/flash_block_probe.py [block ...]
"""
import functools
import sys
import time

t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu import flash_attention as fa

B, H, S, DH = 4, 16, 1280, 128
VALID = 1216  # un-padded joint length at the production geometry


def make(block_fwd, block_bwd):
    bs = fa.BlockSizes(
        block_q=block_fwd, block_k_major=block_fwd, block_k=block_fwd,
        block_b=1,
        block_q_major_dkv=block_bwd, block_k_major_dkv=block_bwd,
        block_k_dkv=block_bwd, block_q_dkv=block_bwd,
        block_k_major_dq=block_bwd, block_k_dq=block_bwd,
        block_q_dq=block_bwd,
    )

    @jax.jit
    def fwd(q, k, v, seg):
        return fa.flash_attention(q, k, v,
                                  segment_ids=fa.SegmentIds(q=seg, kv=seg),
                                  causal=True, sm_scale=0.088,
                                  block_sizes=bs)

    @jax.jit
    def bwd(q, k, v, seg):
        def f(q, k, v):
            return fa.flash_attention(
                q, k, v, segment_ids=fa.SegmentIds(q=seg, kv=seg),
                causal=True, sm_scale=0.088, block_sizes=bs).sum()
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    return fwd, bwd


def _sync(out):
    # block_until_ready is unreliable on the experimental axon backend;
    # a host pull of one element is a true sync
    return float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])


def bench(fn, *args, n=30):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / n


rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, H, S, DH)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, H, S, DH)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, H, S, DH)), jnp.bfloat16)
seg = jnp.asarray(np.arange(S)[None, :] < VALID, jnp.int32).repeat(B, 0)

blocks = [int(b) for b in sys.argv[1:]] or [128, 256, 640, 1280]
for bf in blocks:
    for bb in blocks:
        try:
            fwd, bwd = make(bf, bb)
            t_f = bench(fwd, q, k, v, seg)
            t_b = bench(bwd, q, k, v, seg)
            log(f"fwd_block {bf:5d} bwd_block {bb:5d}: "
                f"fwd {t_f*1000:6.2f} ms  fwd+bwd {t_b*1000:6.2f} ms")
        except Exception as e:
            log(f"fwd_block {bf:5d} bwd_block {bb:5d}: FAILED "
                f"{type(e).__name__}: {str(e)[:120]}")
