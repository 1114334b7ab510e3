"""Pallas int8-weight matmul for the decode hot path.

XLA cannot stream int8 weights at int8 bandwidth (the bf16 conversion is
materialized in HBM — measured 0.99x, ``tools/int8_probe.py``), so this
kernel DMAs int8 weight tiles into VMEM via the Pallas pipeline and
dequantizes in registers right before the MXU dot. Per-output-channel
symmetric scales.

y[b, n] = sum_k x[b, k] * (w_i8[k, n] * scale[n])   (+ optional bias)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[K, N] float -> (int8 [K, N], scale [N]) per-output-channel symmetric."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _kernel(x_ref, w_ref, s_ref, o_ref, *, block_n: int):
    x = x_ref[:].astype(jnp.float32)  # [B, K]
    w = w_ref[:].astype(jnp.float32)  # [K, block_n] (dequant int8 -> f32)
    s = s_ref[:]  # [1, block_n] f32
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[:] = (y * s).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret", "out_dtype_name"))
def int8_matmul(
    x: jnp.ndarray,  # [B, K] activations
    w_q: jnp.ndarray,  # [K, N] int8
    scale: jnp.ndarray,  # [N] f32
    *,
    block_n: int = 512,
    interpret: bool = False,
    out_dtype_name: str = "bfloat16",
) -> jnp.ndarray:
    b, k = x.shape
    kk, n = w_q.shape
    assert k == kk and n % block_n == 0, (x.shape, w_q.shape, block_n)
    out = pl.pallas_call(
        functools.partial(_kernel, block_n=block_n),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.dtype(out_dtype_name)),
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w_q, scale.reshape(1, -1).astype(jnp.float32))
    return out


def int8_matmul_reference(x, w_q, scale):
    w = w_q.astype(jnp.float32) * scale[None, :].astype(jnp.float32)
    return (x.astype(jnp.float32) @ w).astype(jnp.bfloat16)
