"""Pallas flash-decoding attention kernel vs the jnp reference
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssr_speech_tpu.ops import decode_attention as da


@pytest.mark.parametrize("pos", [5, 255, 256, 300, 511])
def test_kernel_matches_reference(pos):
    rng = np.random.default_rng(0)
    B, H, T, Dh = 2, 4, 512, 64
    q = jnp.asarray(rng.normal(size=(B, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    ban = jnp.asarray([[0, 0], [1, 37]], jnp.int32)
    got = da.decode_attention(q, k, v, jnp.asarray(pos, jnp.int32), ban,
                              chunk=256, interpret=True)
    want = da.decode_attention_reference(q, k, v, jnp.asarray(pos), ban)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_kernel_ignores_garbage_beyond_pos():
    rng = np.random.default_rng(1)
    B, H, T, Dh = 1, 2, 256, 32
    q = jnp.asarray(rng.normal(size=(B, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    ban = jnp.zeros((B, 2), jnp.int32)
    pos = jnp.asarray(100, jnp.int32)
    out1 = da.decode_attention(q, k, v, pos, ban, chunk=128, interpret=True)
    # poison everything beyond pos
    k2 = k.at[:, :, 101:].set(1e9)
    v2 = v.at[:, :, 101:].set(-1e9)
    out2 = da.decode_attention(q, k2, v2, pos, ban, chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-6)


def test_int8_matmul_kernel_matches_reference():
    """The int8 dequant matmul kernel (ops/int8_matmul.py) — kept as the
    measured-out investigation artifact (docs/DESIGN.md) but still correct."""
    from ssr_speech_tpu.ops import int8_matmul as m

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(256, 1024), scale=0.05), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 256)), jnp.bfloat16)
    wq, s = m.quantize_weight(w)
    got = m.int8_matmul(x, wq, s, block_n=256, interpret=True)
    want = m.int8_matmul_reference(x, wq, s)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=1e-2)
    # quantization error vs the original weights stays ~1%
    full = x.astype(jnp.float32) @ w
    rel = float(jnp.max(jnp.abs(want.astype(jnp.float32) - full))
                / jnp.max(jnp.abs(full)))
    assert rel < 0.02
