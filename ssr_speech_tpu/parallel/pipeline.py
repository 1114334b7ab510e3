"""GPipe-style pipeline parallelism for the SSR LM transformer stack.

The reference scales with data parallelism only (``main.py:47-53``,
``steps/trainer.py:48``; SURVEY §2.4 "TP/PP/SP/EP: absent"). This module adds
the ``pp`` mesh axis the TPU-native way: the stacked layer parameters are
stage-sharded over ``pp`` and microbatches stream through the stages with a
``shard_map`` + ``lax.ppermute`` schedule — one compiled program, forward AND
backward (JAX differentiates through the collective permute), composing with
the ``dp`` (batch) and ``tp`` (megatron tensor-parallel) axes.

Schedule: with M microbatches and P stages the loop runs M+P-1 ticks; at tick
t stage s processes microbatch t-s (garbage during bubble ticks is computed
and discarded — standard GPipe; bubble fraction (P-1)/(M+P-1)). Activations
move stage→stage+1 with a single ppermute per tick, riding the ICI.

Tensor parallelism inside a stage is explicit megatron math: q/k/v and
ffn1 are column-parallel (each tp rank holds a head / hidden block), out-proj
and ffn2 are row-parallel with a ``psum`` over ``tp`` — the same sharding the
GSPMD path uses (``parallel/mesh.py::ssr_param_specs``), hand-written here
because inside ``shard_map`` the collectives are explicit.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SSRModelConfig
from ..models import transformer as trf

try:  # jax >= 0.6 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def make_pp_mesh(n_devices: Optional[int] = None, pp: int = 2, tp: int = 1,
                 devices=None) -> Mesh:
    """3-axis ``(pp, dp, tp)`` mesh. pp rides the slowest links (stage
    activations cross once per tick), tp the fastest (two psums per layer)."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % (pp * tp) == 0, (n, pp, tp)
    arr = np.asarray(devices).reshape(pp, n // (pp * tp), tp)
    return Mesh(arr, ("pp", "dp", "tp"))


def _layer_specs_pp() -> Dict[str, P]:
    """PartitionSpecs for the pipeline's layer tree (qkv pre-split so the tp
    column shards don't mix q/k/v blocks)."""
    return dict(
        ln1_w=P("pp", None), ln1_b=P("pp", None),
        q_w=P("pp", None, "tp"), q_b=P("pp", "tp"),
        k_w=P("pp", None, "tp"), k_b=P("pp", "tp"),
        v_w=P("pp", None, "tp"), v_b=P("pp", "tp"),
        out_w=P("pp", "tp", None), out_b=P("pp", None),
        ln2_w=P("pp", None), ln2_b=P("pp", None),
        ffn1_w=P("pp", None, "tp"), ffn1_b=P("pp", "tp"),
        ffn2_w=P("pp", "tp", None), ffn2_b=P("pp", None),
    )


def split_qkv(layers: Dict[str, Any], d_model: int) -> Dict[str, Any]:
    """Stacked layer tree with the packed qkv projection split into q/k/v so
    each can be column-sharded over tp independently."""
    out = {k: v for k, v in layers.items() if k not in ("qkv_w", "qkv_b")}
    qkv_w, qkv_b = layers["qkv_w"], layers["qkv_b"]
    d = d_model
    out["q_w"], out["k_w"], out["v_w"] = (
        qkv_w[..., :d], qkv_w[..., d:2 * d], qkv_w[..., 2 * d:])
    out["q_b"], out["k_b"], out["v_b"] = (
        qkv_b[..., :d], qkv_b[..., d:2 * d], qkv_b[..., 2 * d:])
    return out


def pp_param_specs() -> Dict[str, Any]:
    """PartitionSpec tree for the FULL SSR param dict (as stored: packed qkv)
    under the pp mesh: layer stack over pp, megatron tp on the unpacked
    matrices, heads tp-sharded, everything else replicated. The packed qkv is
    kept tp-replicated at rest — ``pipeline_transformer`` splits it into
    q/k/v and ``shard_map`` distributes the blocks (sharding the packed
    [.., 3D] axis directly would interleave q/k/v columns across ranks)."""
    specs = {k: v for k, v in _layer_specs_pp().items()
             if k not in ("q_w", "q_b", "k_w", "k_b", "v_w", "v_b")}
    specs["qkv_w"] = P("pp", None, None)
    specs["qkv_b"] = P("pp", None)
    return dict(
        text_emb=P(None, None),
        audio_emb=P(None, None, None),
        text_pos_alpha=P(None),
        audio_pos_alpha=P(None),
        decoder=dict(
            layers=specs,
            final_ln_w=P(None), final_ln_b=P(None),
        ),
        head1_w=P(None, None, "tp"), head1_b=P(None, "tp"),
        head2_w=P(None, "tp", None), head2_b=P(None, None),
    )


def _apply_stage(layers_local, h, bias, key_valid, mkey, *,
                 cfg: SSRModelConfig, stage, layers_per_stage: int,
                 tp_size: int, dtype, deterministic: bool, remat: str,
                 unroll: bool = False):
    """Apply this stage's contiguous layer slice to one microbatch.

    layers_local: stage slice, leaves [Ls, ...] (tp blocks already local).
    h [mb, S, D] replicated over tp; bias [mb, 1, S, S] (einsum attention) or
    a dummy when ``cfg.attn_impl`` is fused; key_valid [mb, S] bool (fused
    attention segment mask — the flagship splash/dots_masks operating point
    runs here exactly as on the single-chip step, see ``flash_attend_xy``).
    remat: mode string (``transformer.wrap_remat``).
    """
    nhead_local = cfg.nhead // tp_size
    rate = cfg.trm_dropout
    act = trf._ffn_act(cfg, deterministic)
    tp_idx = jax.lax.axis_index("tp") if tp_size > 1 else 0
    use_fused = cfg.attn_impl in ("flash", "splash")

    def _mha(q, k, v):
        if use_fused:
            from ..ops.flash_attention import flash_attend_xy

            # already per-device inside shard_map: no mesh wrapper; the tp
            # head shard is embarrassingly parallel for attention
            return flash_attend_xy(q, k, v, key_valid, impl=cfg.attn_impl)
        return trf._attend(q, k, v, bias.astype(jnp.float32))

    def body(h, xs):
        lp, li = xs
        # per-GLOBAL-layer dropout key (stage offset keeps streams distinct)
        key = jax.random.fold_in(mkey, stage * layers_per_stage + li)
        k1, k2, k3 = jax.random.split(key, 3)
        hn = trf.layer_norm(h, lp["ln1_w"], lp["ln1_b"])
        q = hn @ lp["q_w"].astype(dtype) + lp["q_b"].astype(dtype)
        k = hn @ lp["k_w"].astype(dtype) + lp["k_b"].astype(dtype)
        v = hn @ lp["v_w"].astype(dtype) + lp["v_b"].astype(dtype)
        attn = _mha(
            trf._split_heads(q, nhead_local), trf._split_heads(k, nhead_local),
            trf._split_heads(v, nhead_local))
        attn = trf._merge_heads(attn) @ lp["out_w"].astype(dtype)
        if tp_size > 1:  # row-parallel out-proj: partial sums over head blocks
            attn = jax.lax.psum(attn, "tp")
        attn = attn + lp["out_b"].astype(dtype)
        h = h + trf._dropout(attn, rate, k1, deterministic)
        hn = trf.layer_norm(h, lp["ln2_w"], lp["ln2_b"])
        ff = act(hn @ lp["ffn1_w"].astype(dtype) + lp["ffn1_b"].astype(dtype))
        # hidden dropout acts on the LOCAL ffn block: decorrelate ranks
        ff = trf._dropout(ff, rate, jax.random.fold_in(k2, tp_idx), deterministic)
        ff = ff @ lp["ffn2_w"].astype(dtype)
        if tp_size > 1:
            ff = jax.lax.psum(ff, "tp")
        ff = ff + lp["ffn2_b"].astype(dtype)
        h = h + trf._dropout(ff, rate, k3, deterministic)
        return h, None

    scan_body = trf.wrap_remat(body, remat)
    if unroll:  # same grad-stacking win as transformer_forward(unroll=True)
        h = h.astype(dtype)
        for li in range(layers_per_stage):
            lp = jax.tree.map(lambda a: a[li], layers_local)
            lbody = body if (remat == "mixed" and li % 2 == 0) else scan_body
            h, _ = lbody(h, (lp, jnp.asarray(li)))
    else:
        h, _ = jax.lax.scan(scan_body, h.astype(dtype),
                            (layers_local, jnp.arange(layers_per_stage)))
    return h


def _pipeline_local(layers_local, h_all, bias_all, kv_all, rng, *,
                    cfg: SSRModelConfig, pp: int, tp_size: int, dtype,
                    deterministic: bool, remat: str, unroll: bool = False):
    """shard_map body: the GPipe tick loop on ONE device (= one pp stage,
    one dp batch shard, one tp block).

    h_all [M, mb, S, D] microbatched embeddings (replicated over pp/tp),
    bias_all [M, mb, 1, S, S] (einsum; a [M, mb, 1, 1, 1] dummy under fused
    attention), kv_all [M, mb, S] bool key validity (fused attention; all-True
    under einsum). Returns the last stage's outputs broadcast to every stage
    via a masked psum (one [M, mb, S, D] all-reduce per step).
    """
    M = h_all.shape[0]
    stage = jax.lax.axis_index("pp")
    layers_per_stage = cfg.num_layers // pp
    h_all = h_all.astype(dtype)
    state0 = jnp.zeros_like(h_all[0])
    out0 = jnp.zeros_like(h_all)

    def tick(carry, t):
        state, out = carry
        m_in = jnp.clip(t, 0, M - 1)  # microbatch entering stage 0
        inp = jnp.where(stage == 0,
                        jax.lax.dynamic_index_in_dim(h_all, m_in, keepdims=False),
                        state)
        m_here = jnp.clip(t - stage, 0, M - 1)  # microbatch at this stage
        bias = jax.lax.dynamic_index_in_dim(bias_all, m_here, keepdims=False)
        kv = jax.lax.dynamic_index_in_dim(kv_all, m_here, keepdims=False)
        # fold the dp coordinate in too: without it every dp shard of a
        # microbatch draws IDENTICAL dropout masks (the GSPMD step's masks
        # are globally random across the batch)
        mkey = jax.random.fold_in(jax.random.fold_in(rng, m_here),
                                  jax.lax.axis_index("dp"))
        y = _apply_stage(layers_local, inp, bias, kv, mkey, cfg=cfg,
                         stage=stage, layers_per_stage=layers_per_stage,
                         tp_size=tp_size, dtype=dtype,
                         deterministic=deterministic, remat=remat,
                         unroll=unroll)
        # last stage writes microbatch t-(P-1)'s finished activations
        m_out = t - (pp - 1)
        write = (stage == pp - 1) & (m_out >= 0)
        m_out = jnp.clip(m_out, 0, M - 1)
        cur = jax.lax.dynamic_index_in_dim(out, m_out, keepdims=False)
        new = jnp.where(write, y, cur)
        out = jax.lax.dynamic_update_index_in_dim(out, new, m_out, 0)
        state = jax.lax.ppermute(y, "pp", [(i, (i + 1) % pp) for i in range(pp)])
        return (state, out), None

    (_, out), _ = jax.lax.scan(tick, (state0, out0), jnp.arange(M + pp - 1))
    # broadcast the finished activations from the last stage to all stages
    out = jax.lax.psum(jnp.where(stage == pp - 1, out, jnp.zeros_like(out)), "pp")
    return out


def pipeline_transformer(
    dec_params: Dict[str, Any],
    h_mb: jnp.ndarray,
    bias_mb: jnp.ndarray,
    cfg: SSRModelConfig,
    mesh: Mesh,
    *,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    dtype=jnp.bfloat16,
    remat="full",
    unroll: bool = False,
    key_valid_mb: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pipelined equivalent of ``transformer_forward`` over microbatches.

    dec_params: the decoder tree (stacked ``layers`` + final norm); h_mb
    [M, mb, S, D]; bias_mb [M, mb, 1, S, S] (any trailing dims under fused
    attention — then unused); key_valid_mb [M, mb, S] bool, required when
    ``cfg.attn_impl`` is "flash"/"splash" (the stage body runs the fused
    Pallas kernel per device — the flagship splash + dots_masks operating
    point, same as the single-chip step). remat: mode string or legacy bool
    (``transformer.wrap_remat``). Returns [M, mb, S, D] after the final
    LayerNorm. Output matches ``transformer_forward`` per microbatch up to
    matmul-reduction reordering (tests/test_pipeline.py).
    """
    assert "pp" in mesh.axis_names, mesh.axis_names
    pp = mesh.shape["pp"]
    tp_size = mesh.shape.get("tp", 1)
    assert cfg.num_layers % pp == 0, (cfg.num_layers, pp)
    assert cfg.nhead % tp_size == 0 and cfg.ffn_dim % tp_size == 0
    if rng is None:
        rng = jax.random.PRNGKey(0)
    remat = {True: "full", False: "none"}.get(remat, remat)
    if cfg.attn_impl in ("flash", "splash") and key_valid_mb is None:
        raise ValueError(f"attn_impl={cfg.attn_impl!r} needs key_valid_mb")
    if key_valid_mb is None:  # einsum: unused, keep the operand tree static
        key_valid_mb = jnp.ones(h_mb.shape[:3], bool)

    layers = split_qkv(dec_params["layers"], cfg.d_model)
    lspecs = _layer_specs_pp()
    if tp_size == 1:  # drop the tp axis from specs when the mesh lacks it
        if "tp" not in mesh.axis_names:
            lspecs = jax.tree.map(
                lambda s: P(*(None if a == "tp" else a for a in s)), lspecs,
                is_leaf=lambda x: isinstance(x, P))
    act_spec = P(None, "dp", None, None) if "dp" in mesh.axis_names else P()
    bias_spec = P(None, "dp", None, None, None) if "dp" in mesh.axis_names else P()
    kv_spec = P(None, "dp", None) if "dp" in mesh.axis_names else P()

    body = functools.partial(
        _pipeline_local, cfg=cfg, pp=pp, tp_size=tp_size, dtype=dtype,
        deterministic=deterministic, remat=remat, unroll=unroll)
    out = _shard_map(
        body, mesh=mesh,
        in_specs=(lspecs, act_spec, bias_spec, kv_spec, P()),
        out_specs=act_spec,
        check_vma=False,
    )(layers, h_mb, bias_mb, key_valid_mb, rng)
    return trf.layer_norm(out, dec_params["final_ln_w"], dec_params["final_ln_b"])


def make_pp_train_step(
    cfg: SSRModelConfig,
    tcfg,
    optimizer,
    mesh: Mesh,
    n_micro: Optional[int] = None,
    unroll: Optional[bool] = None,
):
    """Jitted pipeline-parallel train step over a ``(pp, dp, tp)`` mesh.

    Semantics match ``training.trainer.make_train_step`` with gradient
    accumulation = ``n_micro`` (per-microbatch loss normalization for
    mean-normalized optimizers, NaN/Inf skip, identical metrics); the
    microbatch axis here is what streams through the pipeline stages.
    batch: flat x [B,Sx], x_lens, y [B,Sy,K], y_lens with B % n_micro == 0
    and (B/n_micro) % dp == 0. Default n_micro = 2*pp (bubble <= 1/3).
    """
    from ..models import ssr as ssr_model
    from . import mesh as meshlib

    pp = mesh.shape["pp"]
    n_micro = n_micro or 2 * pp
    if unroll is None:  # unroll the per-stage layer loop on TPU (1.58x)
        unroll = jax.default_backend() in ("tpu", "axon")
    compute_dtype = jnp.bfloat16 if tcfg.precision == "bfloat16" else jnp.float32
    normalize = tcfg.optim.optimizer_name.lower() != "scaledadam"
    cw = tcfg.codebook_weight
    fused = cfg.attn_impl in ("flash", "splash")

    def loss_fn(params, batch, rng):
        B, sx = batch["x"].shape
        sy = batch["y"].shape[1]
        M = n_micro
        mb = jax.tree.map(lambda a: a.reshape((M, B // M) + a.shape[1:]), batch)
        keys = jax.random.split(rng, M + 1)
        h_mb, bias_mb, _ = jax.vmap(
            lambda b, k: ssr_model.ssr_embed(
                params, cfg, b, deterministic=False, rng=k)
        )(mb, keys[1:])
        kv_mb = None
        if fused:
            # fused attention rebuilds the xy mask from causality + segment
            # ids; the dense [mb,1,S,S] bias is then dead — hand the stage a
            # dummy so XLA never materializes it
            from ..ops.masking import make_pad_mask

            kv_mb = ~jnp.concatenate(
                [make_pad_mask(batch["x_lens"], sx),
                 make_pad_mask(batch["y_lens"], sy)], axis=1
            ).reshape(M, B // M, sx + sy)
            bias_mb = jnp.zeros((M, B // M, 1, 1, 1), jnp.float32)
        out = pipeline_transformer(
            params["decoder"], h_mb, bias_mb, cfg, mesh,
            rng=keys[0], deterministic=False, dtype=compute_dtype,
            unroll=unroll, remat=cfg.remat, key_valid_mb=kv_mb)

        def mb_loss(o, b):
            res = ssr_model.ssr_loss_from_hidden(
                params, cfg, o[:, sx:], b,
                predict_mask_token=tcfg.masking.predict_mask_token,
                predict_all=tcfg.masking.predict_all, codebook_weight=cw,
                head_dtype=compute_dtype)
            l = res["loss"]
            if normalize:
                l = l / jnp.maximum(res["effective_ntoken"], 1.0)
            return l, res

        losses, res = jax.vmap(mb_loss)(out, mb)
        metrics = dict(
            loss=jnp.sum(res["loss"]),
            top10acc=jnp.sum(res["top10acc"]),
            ntokens=jnp.sum(res["effective_ntoken"]),
            top10acc_by_codebook=jnp.sum(res["top10acc_by_codebook"], axis=0),
        )
        return jnp.sum(losses), metrics

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(params, opt_state, batch, rng):
        (loss_sum, metrics), grads = grad_fn(params, batch, rng)
        grads_finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
        is_good = jnp.isfinite(loss_sum) & grads_finite
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), params, updates)
        params_out = jax.tree.map(
            lambda n, o: jnp.where(is_good, n, o), new_params, params)
        opt_out = jax.tree.map(
            lambda n, o: jnp.where(is_good, n, o), new_opt_state, opt_state)
        metrics = dict(metrics, skipped=(~is_good).astype(jnp.float32))
        return params_out, opt_out, metrics

    ptree = meshlib.named_sharding_tree(mesh, pp_param_specs())
    return jax.jit(
        train_step,
        donate_argnums=(0, 1),
        in_shardings=(ptree, None, None, None),
        # pin the output placement too: without it XLA may emit params with a
        # "better" sharding (e.g. qkv_b over tp), which then mismatches the
        # pinned input sharding when the result is fed back in step 2
        out_shardings=(ptree, None, None),
    )


def shard_params_pp(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    """Place the SSR params for pipeline training (layer stack over pp)."""
    from . import mesh as meshlib

    return meshlib.shard_tree(mesh, params, pp_param_specs())
