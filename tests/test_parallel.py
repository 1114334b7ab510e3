"""Sharding correctness: tensor-parallel and data-parallel execution must
reproduce single-device numerics on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ssr_speech_tpu.config import OptimConfig, TrainConfig, tiny_ssr_config
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.parallel import mesh as meshlib

CFG = tiny_ssr_config(nhead=4)


def make_batch(B=8, sx=12, sy=40, seed=0):
    rng = np.random.default_rng(seed)
    ts = CFG.tokens
    return dict(
        x=rng.integers(0, CFG.text_vocab_size, size=(B, sx)).astype(np.int32),
        x_lens=np.full(B, sx, np.int32),
        y=rng.integers(0, ts.audio_vocab_size, size=(B, sy, CFG.n_codebooks)).astype(np.int32),
        y_lens=np.full(B, sy, np.int32),
    )


def loss_of(params, batch):
    out = ssr_model.ssr_forward(params, CFG, batch, deterministic=True)
    return out["loss"], out["top10acc"]


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_forward_matches_single_device(dp, tp):
    if len(jax.devices()) < dp * tp:
        pytest.skip("not enough devices")
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), CFG)
    batch = make_batch()
    want_loss, want_acc = jax.jit(loss_of)(params, batch)

    mesh = meshlib.make_mesh(n_devices=dp * tp, tp=tp)
    with mesh:
        sp = meshlib.shard_tree(mesh, params, meshlib.ssr_param_specs(params))
        sb = meshlib.shard_tree(mesh, batch, meshlib.batch_specs())
        got_loss, got_acc = jax.jit(loss_of)(sp, sb)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    np.testing.assert_allclose(float(got_acc), float(want_acc), rtol=1e-5)


@pytest.mark.slow
def test_sharded_grads_match_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    params = ssr_model.init_ssr(jax.random.PRNGKey(1), CFG)
    batch = make_batch(seed=1)

    def loss_fn(p, b):
        return loss_of(p, b)[0]

    want = jax.jit(jax.grad(loss_fn))(params, batch)
    mesh = meshlib.make_mesh(n_devices=8, tp=2)
    with mesh:
        sp = meshlib.shard_tree(mesh, params, meshlib.ssr_param_specs(params))
        sb = meshlib.shard_tree(mesh, batch, meshlib.batch_specs())
        got = jax.jit(jax.grad(loss_fn))(sp, sb)
    key = lambda kv: str(kv[0])
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(want), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(got), key=key),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-5,
            err_msg=str(ka),
        )


def test_sequence_parallel_matches():
    """Megatron-SP: the residual stream's sequence axis pinned onto the tp
    group at every layer boundary (transformer_forward act_sharding) changes
    neither the loss nor the gradients."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    params = ssr_model.init_ssr(jax.random.PRNGKey(3), CFG)
    batch = make_batch(seed=3)

    def loss_plain(p, b):
        return ssr_model.ssr_forward(p, CFG, b, deterministic=True)["loss"]

    want_loss = jax.jit(loss_plain)(params, batch)
    want_grad = jax.jit(jax.grad(loss_plain))(params, batch)

    mesh = meshlib.make_mesh(n_devices=8, tp=4)
    act = NamedSharding(mesh, P("dp", "tp", None))

    def loss_sp(p, b):
        return ssr_model.ssr_forward(p, CFG, b, deterministic=True,
                                     act_sharding=act)["loss"]

    with mesh:
        sp = meshlib.shard_tree(mesh, params, meshlib.ssr_param_specs(params))
        sb = meshlib.shard_tree(mesh, batch, meshlib.batch_specs())
        got_loss = jax.jit(loss_sp)(sp, sb)
        got_grad = jax.jit(jax.grad(loss_sp))(sp, sb)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    key = lambda kv: str(kv[0])
    for (ka, a), (_, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(want_grad), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(got_grad), key=key),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5, err_msg=str(ka))


def test_fsdp_sharded_forward_matches():
    """FSDP-style layer-stack sharding over dp (reference has FSDP wired but
    off, optim/fsdp.py:51; here it's a sharding spec): layer params sharded
    on the stack dim across dp AND megatron tp, numerics unchanged."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    cfg = tiny_ssr_config(nhead=4, num_layers=8)

    def loss8(p, b):
        out = ssr_model.ssr_forward(p, cfg, b, deterministic=True)
        return out["loss"]

    params = ssr_model.init_ssr(jax.random.PRNGKey(2), cfg)
    batch = make_batch(seed=2)
    want = jax.jit(loss8)(params, batch)
    mesh = meshlib.make_mesh(n_devices=8, tp=2)  # dp=4 divides num_layers=8
    with mesh:
        specs = meshlib.ssr_param_specs(params, fsdp=True)
        sp = meshlib.shard_tree(mesh, params, specs)
        sb = meshlib.shard_tree(mesh, batch, meshlib.batch_specs())
        got = jax.jit(loss8)(sp, sb)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_mesh_train_step_accepts_rbg_key():
    """The dp×tp GSPMD train step runs with an rbg (hardware
    RngBitGenerator) dropout key — the `train_lm --rng_impl` TPU default
    (BENCHMARKS.md "Training"); rbg draws are layout-dependent so this
    asserts execution + finiteness, not cross-layout bit-equality (which
    is threefry's contract)."""
    from ssr_speech_tpu.config import MaskingConfig
    from ssr_speech_tpu.training import optim as optimlib
    from ssr_speech_tpu.training.trainer import make_train_step

    tcfg = TrainConfig(
        optim=OptimConfig(optimizer_name="scaledadam", lr=0.01,
                          clipping_scale=None, warmup_batches=2,
                          pseudo_epoch_size=1000),
        precision="float32", rng_impl="rbg",
        masking=MaskingConfig(predict_mask_token=True, predict_all=True))
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), CFG)
    opt, _ = optimlib.build_optimizer(tcfg.optim, 100)
    state = opt.init(params)
    mesh = meshlib.make_mesh(tp=2)
    step = make_train_step(CFG, tcfg, opt, mesh)
    params, state, m = step(params, state, make_batch(),
                            jax.random.key(1, impl="rbg"))
    assert np.isfinite(float(m["loss"]))


def test_pp_train_step_accepts_rbg_key():
    """The GPipe pipeline step (shard_map + ppermute) also accepts an rbg
    dropout key: typed extended-dtype key arrays must survive the
    microbatch split/ppermute plumbing."""
    from ssr_speech_tpu.config import MaskingConfig
    from ssr_speech_tpu.parallel import pipeline as pl
    from ssr_speech_tpu.training import optim as optimlib

    tcfg = TrainConfig(
        optim=OptimConfig(optimizer_name="scaledadam", lr=0.01,
                          clipping_scale=None, warmup_batches=2,
                          pseudo_epoch_size=1000),
        precision="float32", rng_impl="rbg",
        masking=MaskingConfig(predict_mask_token=True, predict_all=True))
    opt, _ = optimlib.build_optimizer(tcfg.optim, 100)
    mesh = pl.make_pp_mesh(pp=2, tp=2)
    params = pl.shard_params_pp(mesh, ssr_model.init_ssr(jax.random.PRNGKey(0), CFG))
    state = opt.init(params)
    step = pl.make_pp_train_step(CFG, tcfg, opt, mesh, n_micro=2)
    params, state, m = step(params, state, make_batch(),
                            jax.random.key(2, impl="rbg"))
    assert np.isfinite(float(m["loss"]))
