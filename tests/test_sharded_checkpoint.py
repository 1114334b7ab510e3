"""Orbax sharded checkpointing across mesh layouts (multi-host protocol,
validated on the virtual 8-device mesh).

The reference coordinates rank-sharded writes with .tmp/.tmp.done token files
(audiocraft utils/checkpoint.py:125-161); the TPU-native equivalent is orbax:
each host writes only its addressable shards and restore re-shards onto
whatever mesh the reader runs — including a DIFFERENT layout (elastic
restore, e.g. tp=2 training -> tp=4 serving)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding

from ssr_speech_tpu.config import tiny_ssr_config
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.parallel import mesh as meshlib
from ssr_speech_tpu.utils import checkpoint as ckpt


@pytest.mark.parametrize("save_layout,load_layout", [
    ((2, False), (4, False)),   # tp=2 -> tp=4
    # fsdp layer-stack shards (dp=2 divides the tiny 2-layer stack) ->
    # replicated tp=1
    ((4, True), (1, False)),
])
def test_sharded_save_restore_across_layouts(tmp_path, save_layout,
                                             load_layout):
    cfg = tiny_ssr_config()
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
    flat_ref = jax.tree.leaves(jax.tree.map(np.asarray, params))

    tp_s, fsdp_s = save_layout
    mesh_s = meshlib.make_mesh(8, tp=tp_s)
    sharded = meshlib.shard_tree(
        mesh_s, params, meshlib.ssr_param_specs(params, fsdp=fsdp_s))
    path = str(tmp_path / "ckpt")
    ckpt.save_sharded(path, sharded)

    tp_l, fsdp_l = load_layout
    mesh_l = meshlib.make_mesh(8, tp=tp_l)
    template = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh_l, s)),
        params, meshlib.ssr_param_specs(params, fsdp=fsdp_l),
        is_leaf=lambda x: hasattr(x, "shape"),
    )
    restored = ckpt.load_sharded(path, template=template)

    for want, got in zip(flat_ref, jax.tree.leaves(restored)):
        assert isinstance(got.sharding, NamedSharding)
        np.testing.assert_array_equal(np.asarray(got), want)

    # the restored layout must be immediately usable: run a forward
    batch = dict(
        x=np.zeros((2, 8), np.int32),
        x_lens=np.full(2, 8, np.int32),
        y=np.zeros((2, 16, cfg.n_codebooks), np.int32),
        y_lens=np.full(2, 16, np.int32),
    )
    out = ssr_model.ssr_forward(restored, cfg, batch, deterministic=True)
    assert np.isfinite(float(out["loss"]))
