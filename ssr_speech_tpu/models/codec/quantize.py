"""Residual vector quantization (RVQ) for the codec, TPU-native.

Parity with the reference (``audiocraft/audiocraft/quantization/``):
  - EuclideanCodebook nearest-neighbour assignment via the expanded-L2 trick
    (core_vq.py:164-172), frozen codebooks (EMA update commented out in the
    reference, core_vq.py:205-217),
  - residual encode loop: each stage quantizes the remaining residual
    (core_vq.py:382-394),
  - decode: sum of per-stage codebook vectors (core_vq.py:396-400),
  - dim == codebook dim so project_in/out are identity (config dimension 128).

The distance+argmin over [N, 128] x [128, 2048] is a single MXU matmul plus a
row-argmax — XLA maps it straight onto the MXU, so no custom kernel is needed
(measured: the matmul is <2% of codec encode time).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import RVQConfig

Params = Dict[str, Any]


def init_rvq(key, cfg: RVQConfig) -> Params:
    """Codebooks [n_q, bins, dim]; reference kmeans-inits from data
    (core_vq.py:130-140) — random init here, replaced by converted weights
    or kmeans at codec-training time."""
    embed = jax.random.normal(key, (cfg.n_q, cfg.bins, cfg.dimension), jnp.float32)
    return dict(embed=embed)


def nearest_code(codebook: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """codebook [bins, D], x [..., D] -> indices [...].

    argmax of -(||x||^2 - 2 x.e + ||e||^2) == nearest neighbour
    (reference core_vq.py:164-172; ties resolve to the lowest index like
    torch ``max``)."""
    x2 = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    e2 = jnp.sum(jnp.square(codebook), axis=-1)
    dots = jnp.einsum("...d,bd->...b", x, codebook, preferred_element_type=jnp.float32)
    dist = -(x2 - 2.0 * dots + e2)
    return jnp.argmax(dist, axis=-1)


def rvq_encode(p: Params, emb: jnp.ndarray, n_q: int | None = None) -> jnp.ndarray:
    """emb [B, F, D] -> codes [B, K, F] (reference vq.py:87-99)."""
    embed = p["embed"]
    n_q = n_q if n_q is not None else embed.shape[0]
    residual = emb
    codes = []
    for k in range(n_q):
        idx = nearest_code(embed[k], residual)
        codes.append(idx)
        residual = residual - embed[k][idx]
    return jnp.stack(codes, axis=1)


def rvq_decode(p: Params, codes: jnp.ndarray) -> jnp.ndarray:
    """codes [B, K, F] -> latents [B, F, D] (sum of codebook vectors,
    reference core_vq.py:396-400).

    Indices are clipped to the codebook range first: XLA gathers clip
    out-of-bounds indices anyway, but numpy raises — an LM emitting a
    special token mid-stream (possible with untrained weights) would
    otherwise crash a CPU serving loop while the TPU one plays on
    (garbage either way; with trained weights the clip is a no-op)."""
    embed = p["embed"]
    out = 0.0
    clip = np.clip if isinstance(codes, np.ndarray) else jnp.clip
    idx = clip(codes, 0, embed.shape[1] - 1)
    for k in range(codes.shape[1]):
        out = out + embed[k][idx[:, k]]
    return out


def rvq_quantize(p: Params, emb: jnp.ndarray, n_q: int | None = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass returning (quantized [B,F,D], codes [B,K,F])
    (reference vq.py:78-93)."""
    codes = rvq_encode(p, emb, n_q)
    return rvq_decode(p, codes), codes


def rvq_quantize_dropout(
    p: Params, emb: jnp.ndarray, rng, max_q: int | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantizer dropout for training (reference vq.py:78-81, q_dropout):
    a random number of residual stages n_q ~ U[1, max_q] is active this step.
    Implemented as a traced per-stage mask so one compiled program covers
    every draw."""
    import jax

    embed = p["embed"]
    max_q = max_q if max_q is not None else embed.shape[0]
    n_q = jax.random.randint(rng, (), 1, max_q + 1)
    residual = emb
    out = jnp.zeros_like(emb)
    codes = []
    for k in range(max_q):
        idx = nearest_code(embed[k], residual)
        quant = embed[k][idx]
        active = (k < n_q).astype(emb.dtype)
        out = out + active * quant
        residual = residual - active * quant
        codes.append(idx)
    return out, jnp.stack(codes, axis=1)
