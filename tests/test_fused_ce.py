"""Fused CE head (ops/fused_ce.py): fallback math, custom_vjp gradients, and
the ce_impl='fused' model path vs the unfused loss.

On CPU ``fused_ce_head`` runs :func:`reference_ce_head` (the kernel's exact
math); the Pallas kernels themselves are A/B'd against it on TPU by
``tools/train_breakdown_probe.py ce_check``. These tests lock (a) the
reference math against the plain-jnp unfused loss, (b) the custom_vjp wiring,
and (c) that ``SSRModelConfig.ce_impl='fused'`` preserves the training loss,
per-codebook accuracy, and gradients of the full model forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssr_speech_tpu.config import tiny_ssr_config
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.ops import fused_ce, patterns

CFG = tiny_ssr_config()


@pytest.fixture(scope="module")
def params():
    return ssr_model.init_ssr(jax.random.PRNGKey(0), CFG)


def make_batch(rng, B=2, sx=12, sy=40):
    ts = CFG.tokens
    x = rng.integers(0, CFG.text_vocab_size, size=(B, sx))
    x_lens = rng.integers(sx // 2, sx + 1, size=(B,))
    y_lens = np.zeros(B, np.int64)
    ys = np.full((B, sy, CFG.n_codebooks), ts.pad, np.int64)
    for b in range(B):
        t = int(rng.integers(10, 20))
        raw = rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, t))
        cated, _ = patterns.build_lm_sequence(raw, [(2, 5)], ts)
        L = min(cated.shape[1], sy)
        ys[b, :L] = cated.T[:L]
        y_lens[b] = L
    for b in range(B):
        x[b, x_lens[b]:] = CFG.text_pad_token
    return dict(x=jnp.asarray(x), x_lens=jnp.asarray(x_lens),
                y=jnp.asarray(ys), y_lens=jnp.asarray(y_lens))


def _head_inputs(key, K=3, N=37, Hh=16, C=29, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    hid = (jax.random.normal(k1, (K, N, Hh)) * 0.5).astype(dtype)
    w2 = (jax.random.normal(k2, (K, Hh, C)) * 0.2).astype(dtype)
    b2 = (jax.random.normal(k3, (K, C)) * 0.1).astype(dtype)
    tgt = jax.random.randint(k4, (K, N), 0, C)
    return hid, w2, b2, tgt


def test_reference_matches_plain_jnp():
    hid, w2, b2, tgt = _head_inputs(jax.random.PRNGKey(0))
    nll, hits = fused_ce.reference_ce_head(hid, w2, b2, tgt, top=10)
    logits = jnp.einsum("knh,khc->knc", hid, w2) + b2[:, None, :]
    logz = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
    tl = jnp.take_along_axis(logits, tgt[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(nll, logz - tl, rtol=1e-5, atol=1e-5)
    # hits: target within the top 10 logits of its row
    order = jnp.argsort(-logits, axis=-1)[..., :10]
    in_top = jnp.any(order == tgt[..., None], axis=-1)
    np.testing.assert_array_equal(np.asarray(hits, bool), np.asarray(in_top))


def test_custom_vjp_matches_direct_grad():
    hid, w2, b2, tgt = _head_inputs(jax.random.PRNGKey(1))
    g = jax.random.normal(jax.random.PRNGKey(2), tgt.shape)

    def via_custom(h, w, b):
        nll, _ = fused_ce.fused_ce_head(h, w, b, tgt)
        return jnp.sum(nll * g)

    def via_reference(h, w, b):
        nll, _ = fused_ce.reference_ce_head(h, w, b, tgt)
        return jnp.sum(nll * g)

    gc = jax.grad(via_custom, argnums=(0, 1, 2))(hid, w2, b2)
    gr = jax.grad(via_reference, argnums=(0, 1, 2))(hid, w2, b2)
    for a, b in zip(gc, gr):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_hits_cotangent_is_ignored():
    """`hits` is a.e. locally constant; its cotangent must not poison grads."""
    hid, w2, b2, tgt = _head_inputs(jax.random.PRNGKey(3))

    def loss(h):
        nll, hits = fused_ce.fused_ce_head(h, w2, b2, tgt)
        return jnp.sum(nll) + 0.0 * jnp.sum(hits)

    gh = jax.grad(loss)(hid)
    assert bool(jnp.all(jnp.isfinite(gh)))


def test_model_loss_fused_vs_unfused(params):
    batch = make_batch(np.random.default_rng(0))
    fused_cfg = dataclasses.replace(CFG, ce_impl="fused")
    out_u = ssr_model.ssr_forward(params, CFG, batch)
    out_f = ssr_model.ssr_forward(params, fused_cfg, batch)
    np.testing.assert_allclose(float(out_f["loss"]), float(out_u["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(out_f["top10acc_by_codebook"],
                               out_u["top10acc_by_codebook"],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out_f["loss_by_codebook"],
                               out_u["loss_by_codebook"], rtol=2e-5)


def test_model_grads_fused_vs_unfused(params):
    batch = make_batch(np.random.default_rng(1))
    fused_cfg = dataclasses.replace(CFG, ce_impl="fused")

    def loss_fn(p, cfg):
        return ssr_model.ssr_forward(p, cfg, batch)["loss"]

    gu = jax.grad(loss_fn)(params, CFG)
    gf = jax.grad(loss_fn)(params, fused_cfg)
    flat_u = jax.tree_util.tree_leaves_with_path(gu)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, lu in flat_u:
        lf = flat_f[path]
        np.testing.assert_allclose(
            lf, lu, rtol=5e-4, atol=5e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
