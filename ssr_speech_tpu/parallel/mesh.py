"""Device mesh and sharding rules.

The reference scales with DDP over NCCL only (``main.py:47-53``,
``steps/trainer.py:48``; SURVEY §2.4). The TPU-native equivalent is SPMD over
a ``jax.sharding.Mesh``:

  - axis ``dp``: data parallel — batch sharded, params replicated, gradient
    psum inserted by XLA (replaces torch DDP's NCCL all-reduce),
  - axis ``tp``: tensor parallel over attention heads / FFN hidden — a
    capability the reference lacks but that d_model=2048/16-head decode
    benefits from on multi-chip serving,
  - FSDP-style parameter sharding (present-but-off in the reference,
    ``optim/fsdp.py:51``) is expressible here by sharding the layer-stacked
    leading dims; exposed via ``fsdp`` flag.

Metric reductions (``dist.all_reduce`` at steps/trainer.py:102-105) become
plain ``jnp`` reductions over sharded arrays — XLA emits the collectives.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    tp: int = 1,
    devices=None,
    dp_name: str = "dp",
    tp_name: str = "tp",
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % tp == 0, (n, tp)
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, (dp_name, tp_name))


def ssr_param_specs(params: Dict[str, Any], fsdp: bool = False) -> Dict[str, Any]:
    """PartitionSpec tree for the SSR LM params (megatron-style TP).

    qkv / ffn-in are column-parallel (output dim on ``tp``), attn-out /
    ffn-out are row-parallel (input dim on ``tp``); per-codebook heads shard
    their hidden dim. Everything else is replicated (or sharded on the
    layer-stack dim when ``fsdp``).
    """
    dp = "dp" if fsdp else None
    layer_specs = dict(
        ln1_w=P(None, None), ln1_b=P(None, None),
        qkv_w=P(None, None, "tp"), qkv_b=P(None, "tp"),
        out_w=P(None, "tp", None), out_b=P(None, None),
        ln2_w=P(None, None), ln2_b=P(None, None),
        ffn1_w=P(None, None, "tp"), ffn1_b=P(None, "tp"),
        ffn2_w=P(None, "tp", None), ffn2_b=P(None, None),
    )
    if fsdp:
        # additionally shard the layer-stack dim over dp (ZeRO-3 style)
        layer_specs = {k: P(*(("dp",) + tuple(s)[1:])) for k, s in layer_specs.items()}
    return dict(
        text_emb=P(None, None),
        audio_emb=P(None, None, None),
        text_pos_alpha=P(None),
        audio_pos_alpha=P(None),
        decoder=dict(
            layers=layer_specs,
            final_ln_w=P(None), final_ln_b=P(None),
        ),
        head1_w=P(None, None, "tp"), head1_b=P(None, "tp"),
        head2_w=P(None, "tp", None), head2_b=P(None, None),
    )


def shard_params_for_serving(mesh: Mesh, params: Dict[str, Any],
                             fsdp: bool = False) -> Dict[str, Any]:
    """Place LM params for tensor-parallel SERVING (multi-chip decode).

    The decode path (``inference.decode``) is sharding-transparent: with
    params placed on a tp mesh (qkv/ffn column-parallel, out/ffn2
    row-parallel per :func:`ssr_param_specs`), XLA's sharding propagation
    partitions the prefill and the whole decode while-loop — the KV cache
    inherits the head-axis sharding from the qkv projections and attention
    psum rides the ICI. Token streams are bit-exact vs single-device
    (tests/test_sharded_decode.py). No decode-code changes are required:
    computation follows the data.
    """
    return shard_tree(mesh, params, ssr_param_specs(params, fsdp=fsdp))


def batch_specs() -> Dict[str, P]:
    """Batch sharded over dp on the leading axis."""
    return dict(
        x=P("dp", None), x_lens=P("dp"),
        y=P("dp", None, None), y_lens=P("dp"),
    )


def shard_tree(mesh: Mesh, tree, specs):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def named_sharding_tree(mesh: Mesh, specs):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
