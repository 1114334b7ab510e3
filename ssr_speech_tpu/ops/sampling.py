"""Top-k / nucleus (top-p) filtered categorical sampling, pure-functional.

Parity target: reference ``top_k_top_p_filtering`` / ``topk_sampling``
(``models/ssr.py:26-86``), re-expressed without in-place logit mutation so it
runs inside a compiled ``lax.while_loop``:
  - top_k > 0: keep only the k highest logits (k clamped to [1, vocab]);
    top_k <= 0 disables top-k (the reference's `if top_k > 0` gate);
  - top_p < 1: drop tokens whose sorted-cumulative probability exceeds top_p,
    always keeping the first above-threshold token;
  - temperature applied before filtering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FILTER_VALUE = -jnp.inf


def top_k_top_p_filter(
    logits: jnp.ndarray, top_k: int = 0, top_p: float = 1.0
) -> jnp.ndarray:
    """logits [..., V] -> filtered logits (static top_k / top_p)."""
    v = logits.shape[-1]
    if top_k > 0:
        k = min(max(top_k, 1), v)
        thresh = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < thresh, FILTER_VALUE, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        sorted_idx = jnp.argsort(logits, axis=-1)[..., ::-1]
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove = cum > top_p
        # shift right so the first token above threshold is kept
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
        )
        # scatter back to original ordering via the inverse permutation
        inv = jnp.argsort(sorted_idx, axis=-1)
        remove_orig = jnp.take_along_axis(remove, inv, axis=-1)
        logits = jnp.where(remove_orig, FILTER_VALUE, logits)
    return logits


def sample_tokens(
    key: jax.Array,
    logits: jnp.ndarray,
    top_k: int = 0,
    top_p: float = 1.0,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Sample token ids [...,] from logits [..., V]
    (reference ``topk_sampling``, ``models/ssr.py:71-86``)."""
    if temperature != 1.0:
        logits = logits / temperature
    logits = top_k_top_p_filter(logits, top_k=top_k, top_p=top_p)
    return jax.random.categorical(key, logits, axis=-1)
