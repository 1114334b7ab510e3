"""Fused-attention wrapper semantics (ops/flash_attention.py).

CPU checks lock the fallback path against the einsum+xy_attn_bias reference
on valid rows; the TPU-gated test locks the Pallas kernel against the
fallback. The training-forward test locks attn_impl="flash" against
attn_impl="einsum" end-to-end through the loss (valid entries only — padded
rows differ by design and are loss-masked).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssr_speech_tpu.config import SSRModelConfig
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.models import transformer as trf
from ssr_speech_tpu.ops import flash_attention as flat
from ssr_speech_tpu.ops.masking import make_pad_mask, xy_attn_bias


def _rand_qkv(key, b, h, s, dh):
    ks = jax.random.split(key, 3)
    return [jax.random.normal(k, (b, h, s, dh), jnp.float32) for k in ks]


def test_fallback_matches_xy_bias_on_valid_rows():
    b, h, s, dh = 2, 2, 24, 16
    sx, sy = 8, 16
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), b, h, s, dh)
    x_lens = jnp.asarray([8, 5])
    y_lens = jnp.asarray([16, 11])
    bias = xy_attn_bias(x_lens, y_lens, sx, sy)
    want = trf._attend(q, k, v, bias)  # _attend scales by 1/sqrt(dh) itself

    key_valid = ~jnp.concatenate(
        [make_pad_mask(x_lens, sx), make_pad_mask(y_lens, sy)], axis=1)
    got = flat.reference_attend(q, k, v, key_valid, 1.0 / math.sqrt(dh))

    valid = np.asarray(key_valid)  # query validity == key validity here
    for bi in range(b):
        np.testing.assert_allclose(
            np.asarray(got)[bi][:, valid[bi]], np.asarray(want)[bi][:, valid[bi]],
            atol=1e-5, rtol=1e-5)


def test_padded_rows_are_finite():
    b, h, s, dh = 1, 1, 12, 8
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), b, h, s, dh)
    key_valid = jnp.asarray([[True] * 3 + [False] * 2 + [True] * 5 + [False] * 2])
    out = flat.flash_attend_xy(q, k, v, key_valid)
    assert np.all(np.isfinite(np.asarray(out)))


def test_flash_forward_matches_einsum_loss():
    """ssr_forward with attn_impl=flash == einsum (same weights, same batch):
    identical loss/metrics to fp tolerance. On CPU this exercises the
    fallback path; on TPU (head_dim 128) the Pallas kernel."""
    on_tpu = jax.default_backend() in ("tpu", "axon")
    kw = dict(num_layers=2, n_codebooks=2, text_vocab_size=30,
              trm_dropout=0.0, text_embedding_dropout=0.0,
              text_positional_embedding_dropout=0.0,
              audio_positional_embedding_dropout=0.0)
    if on_tpu:
        kw.update(d_model=256, nhead=2, audio_embedding_dim=256)
    else:
        kw.update(d_model=64, nhead=2, audio_embedding_dim=64)
    rng = np.random.default_rng(3)
    cfg_e = SSRModelConfig(attn_impl="einsum", **kw)
    cfg_f = SSRModelConfig(attn_impl="flash", **kw)
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg_e)
    B, sx, sy = 2, 7, 21
    ts = cfg_e.tokens
    batch = dict(
        x=jnp.asarray(rng.integers(0, 30, size=(B, sx)), jnp.int32),
        x_lens=jnp.asarray([7, 4], jnp.int32),
        y=jnp.asarray(rng.integers(0, ts.audio_vocab_size, size=(B, sy, 2)),
                      jnp.int32),
        y_lens=jnp.asarray([21, 15], jnp.int32))
    out_e = ssr_model.ssr_forward(params, cfg_e, batch)
    out_f = ssr_model.ssr_forward(params, cfg_f, batch, remat=False)
    tol = 2e-2 if on_tpu else 1e-5  # kernel reassociates the softmax sums
    np.testing.assert_allclose(float(out_f["loss"]), float(out_e["loss"]),
                               rtol=tol)
    np.testing.assert_allclose(np.asarray(out_f["loss_by_codebook"]),
                               np.asarray(out_e["loss_by_codebook"]), rtol=tol)


def test_flash_grads_match_einsum():
    """Gradient parity through the fused path (fallback on CPU): grads wrt
    params agree with the einsum implementation."""
    kw = dict(d_model=32, nhead=2, audio_embedding_dim=32, num_layers=2,
              n_codebooks=2, text_vocab_size=20, trm_dropout=0.0,
              text_embedding_dropout=0.0,
              text_positional_embedding_dropout=0.0,
              audio_positional_embedding_dropout=0.0)
    if jax.default_backend() in ("tpu", "axon"):
        pytest.skip("CPU-only check of the fallback vjp")
    rng = np.random.default_rng(5)
    cfg_e = SSRModelConfig(attn_impl="einsum", **kw)
    cfg_f = SSRModelConfig(attn_impl="flash", **kw)
    params = ssr_model.init_ssr(jax.random.PRNGKey(1), cfg_e)
    B, sx, sy = 2, 5, 13
    ts = cfg_e.tokens
    batch = dict(
        x=jnp.asarray(rng.integers(0, 20, size=(B, sx)), jnp.int32),
        x_lens=jnp.asarray([5, 3], jnp.int32),
        y=jnp.asarray(rng.integers(0, ts.audio_vocab_size, size=(B, sy, 2)),
                      jnp.int32),
        y_lens=jnp.asarray([13, 9], jnp.int32))

    def loss(p, cfg, **kwargs):
        return ssr_model.ssr_forward(p, cfg, batch, **kwargs)["loss"]

    g_e = jax.grad(loss)(params, cfg_e)
    g_f = jax.grad(loss)(params, cfg_f, remat=False)
    flat_e, flat_f = jax.tree.leaves(g_e), jax.tree.leaves(g_f)
    for a, b in zip(flat_e, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_flash_shard_map_train_step_matches_unsharded():
    """The shard_map'ed flash path (batch on dp, heads on tp) under the
    GSPMD train step produces the same loss as the single-device flash step
    — the partitioning is communication-free and numerics-preserving."""
    from ssr_speech_tpu.config import OptimConfig, TrainConfig, tiny_ssr_config
    from ssr_speech_tpu.parallel import mesh as meshlib
    from ssr_speech_tpu.training import optim as optimlib
    from ssr_speech_tpu.training.trainer import make_train_step

    cfg = tiny_ssr_config(nhead=4, d_model=64, audio_embedding_dim=64,
                          attn_impl="flash", remat="dots", trm_dropout=0.0)
    tcfg = TrainConfig(batch_size=4, optim=OptimConfig(
        optimizer_name="scaledadam", clipping_scale=2.0))
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
    opt, _ = optimlib.build_optimizer(tcfg.optim)
    rng = np.random.default_rng(9)
    ts = cfg.tokens
    batch = dict(
        x=rng.integers(0, cfg.text_vocab_size, size=(4, 12)).astype(np.int32),
        x_lens=np.asarray([12, 9, 12, 7], np.int32),
        y=rng.integers(0, ts.audio_vocab_size, size=(4, 24, cfg.n_codebooks)
                       ).astype(np.int32),
        y_lens=np.asarray([24, 20, 24, 16], np.int32))

    step1 = make_train_step(cfg, tcfg, opt, unroll=False)
    _, _, m1 = step1(params, opt.init(params), batch, jax.random.PRNGKey(1))

    # the steps donate their params; re-init (deterministic) for the mesh run
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
    mesh = meshlib.make_mesh(tp=2)
    with mesh:
        stepN = make_train_step(cfg, tcfg, opt, mesh=mesh, unroll=False)
        sp = meshlib.shard_tree(mesh, params, meshlib.ssr_param_specs(params))
        sb = meshlib.shard_tree(mesh, batch, meshlib.batch_specs())
        _, _, mN = stepN(sp, opt.init(sp), sb, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(mN["loss"]), float(m1["loss"]),
                               rtol=1e-5)


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Pallas TPU kernel")
def test_kernel_matches_fallback_tpu():
    b, h, s, dh = 2, 2, 200, 128  # s not a 128 multiple: exercises padding
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), b, h, s, dh)
    q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    key_valid = jnp.ones((b, s), bool)
    key_valid = key_valid.at[0, 100:120].set(False).at[1, 180:].set(False)
    sm = 1.0 / math.sqrt(dh)
    want = flat.reference_attend(q, k, v, key_valid, sm)
    got = flat._kernel_attend(q, k, v, key_valid.astype(jnp.int32), sm)
    valid = np.asarray(key_valid)
    for bi in range(b):
        np.testing.assert_allclose(
            np.asarray(got, np.float32)[bi][:, valid[bi]],
            np.asarray(want, np.float32)[bi][:, valid[bi]],
            atol=3e-2, rtol=3e-2)


def test_mixed_remat_grads_match_none():
    """remat="mixed" (every other unrolled layer un-rematted) is a pure
    memory policy: grads match remat="none" (and "dots") to XLA fusion
    reassociation tolerance — checkpointing recomputes the same math."""
    kw = dict(d_model=32, nhead=2, num_layers=4, audio_embedding_dim=32,
              n_codebooks=2, text_vocab_size=20, trm_dropout=0.0,
              text_embedding_dropout=0.0,
              text_positional_embedding_dropout=0.0,
              audio_positional_embedding_dropout=0.0)
    rng = np.random.default_rng(11)
    cfg = SSRModelConfig(attn_impl="flash", **kw)
    params = ssr_model.init_ssr(jax.random.PRNGKey(2), cfg)
    B, sx, sy = 2, 5, 13
    ts = cfg.tokens
    batch = dict(
        x=jnp.asarray(rng.integers(0, 20, size=(B, sx)), jnp.int32),
        x_lens=jnp.asarray([5, 3], jnp.int32),
        y=jnp.asarray(rng.integers(0, ts.audio_vocab_size, size=(B, sy, 2)),
                      jnp.int32),
        y_lens=jnp.asarray([13, 9], jnp.int32))

    def loss(p, remat):
        return ssr_model.ssr_forward(p, cfg, batch, unroll=True,
                                     remat=remat)["loss"]

    g_none = jax.jit(jax.grad(loss), static_argnums=1)(params, "none")
    for mode in ("mixed", "dots"):
        g = jax.jit(jax.grad(loss), static_argnums=1)(params, mode)
        for a, b in zip(jax.tree.leaves(g_none), jax.tree.leaves(g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7, rtol=1e-6)


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Pallas TPU kernel")
def test_splash_kernel_matches_fallback_tpu():
    """The splash-attention variant (attn_impl="splash": 256-block fused-bwd
    kernel, 585 -> 542 ms/step, 46.1% MFU at 830M/B=8 — BENCHMARKS.md)
    matches the jnp fallback on valid rows, same contract as the flash
    kernel test above."""
    b, h, s, dh = 2, 2, 200, 128
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), b, h, s, dh)
    q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    key_valid = jnp.ones((b, s), bool)
    key_valid = key_valid.at[0, 100:120].set(False).at[1, 180:].set(False)
    sm = 1.0 / math.sqrt(dh)
    want = flat.reference_attend(q, k, v, key_valid, sm)
    got = flat._splash_attend(q, k, v, key_valid.astype(jnp.int32), sm)
    valid = np.asarray(key_valid)
    for bi in range(b):
        np.testing.assert_allclose(
            np.asarray(got, np.float32)[bi][:, valid[bi]],
            np.asarray(want, np.float32)[bi][:, valid[bi]],
            atol=3e-2, rtol=3e-2)


def test_pick_block_divides_padded_length():
    """Block selection must satisfy splash/flash's block_q | q_seq_len
    requirement for every 128-multiple padded length the 32-multiple
    training buckets can produce (odd multiples of 128 are routine:
    x+y=300 pads to 384, 610 to 640, 1130 to 1152)."""
    for sp in (128, 256, 384, 512, 640, 1152, 1280, 2048):
        for req in (128, 256, 512):
            bq = flat._pick_block(sp, req)
            assert sp % bq == 0 and bq <= sp and bq in (req, 256, 128)
    assert flat._pick_block(384, 256) == 128
    assert flat._pick_block(1280, 256) == 256
    assert flat._pick_block(512, 512) == 512


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Pallas TPU kernel")
def test_splash_kernel_odd_128_multiple_tpu():
    """s=300 pads to 384 — an odd multiple of 128 where the default 256
    block does not divide the padded length. The kernel must fall back to
    128 blocks (not raise) and still match the jnp reference."""
    b, h, s, dh = 2, 2, 300, 128
    q, k, v = _rand_qkv(jax.random.PRNGKey(13), b, h, s, dh)
    q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    key_valid = jnp.ones((b, s), bool)
    key_valid = key_valid.at[0, 150:170].set(False).at[1, 280:].set(False)
    sm = 1.0 / math.sqrt(dh)
    want = flat.reference_attend(q, k, v, key_valid, sm)
    got = flat._splash_attend(q, k, v, key_valid.astype(jnp.int32), sm)
    valid = np.asarray(key_valid)
    for bi in range(b):
        np.testing.assert_allclose(
            np.asarray(got, np.float32)[bi][:, valid[bi]],
            np.asarray(want, np.float32)[bi][:, valid[bi]],
            atol=3e-2, rtol=3e-2)


def test_splash_plumbing_matches_flash_off_tpu():
    """attn_impl="splash" routes through the same fallback as "flash" off
    TPU: identical losses (locks config plumbing; kernel numerics are
    TPU-gated above and checked at 830M by the ab_attn probe's bare-loss
    diff, rel ~7e-7)."""
    kw = dict(d_model=128, nhead=1, num_layers=2, n_codebooks=4,
              audio_embedding_dim=128, text_vocab_size=40, trm_dropout=0.0)
    from ssr_speech_tpu.config import SSRModelConfig
    cfg_f = SSRModelConfig(attn_impl="flash", **kw)
    cfg_s = SSRModelConfig(attn_impl="splash", **kw)
    from ssr_speech_tpu.models import ssr as ssr_model
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg_f)
    rng = np.random.default_rng(0)
    batch = dict(
        x=rng.integers(0, 40, size=(2, 8)).astype(np.int32),
        x_lens=np.array([8, 6], np.int32),
        y=rng.integers(0, cfg_f.tokens.audio_vocab_size,
                       size=(2, 24, 4)).astype(np.int32),
        y_lens=np.array([24, 20], np.int32))
    lf = float(ssr_model.ssr_forward(params, cfg_f, batch,
                                     deterministic=True)["loss"])
    ls = float(ssr_model.ssr_forward(params, cfg_s, batch,
                                     deterministic=True)["loss"])
    assert lf == ls
