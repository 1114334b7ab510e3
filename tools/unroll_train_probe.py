"""Probe: does UNROLLING the layer loop (per-layer param trees, no stacked
[L, ...] arrays) remove the ~150 ms/step of grad-stacking
dynamic-update-slice fusions that the scan transpose produces?
(docs/DESIGN.md "Training step": fwd 107 ms, bwd 476 ms of which ~150 ms are
DUS fusions stacking per-layer parameter grads.)

Variant A: production make_train_step (lax.scan over stacked layers).
Variant B: same math, python-unrolled 16 layers, grads land in 16 separate
           buffers — no stacked-grad DUS at all.
"""
import sys
import time

t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from ssr_speech_tpu.config import OptimConfig, SSRModelConfig, TrainConfig
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.models import transformer as trf
from ssr_speech_tpu.training import optim as optimlib
from ssr_speech_tpu.training.trainer import make_train_step

cfg = SSRModelConfig(d_model=2048, nhead=16, num_layers=16, n_codebooks=4,
                     text_vocab_size=120)
tcfg = TrainConfig(precision="bfloat16",
                   optim=OptimConfig(optimizer_name="scaledadam",
                                     clipping_scale=2.0))
params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
opt, _ = optimlib.build_optimizer(tcfg.optim)
rng = np.random.default_rng(0)
B, sx, sy = int(sys.argv[1]) if len(sys.argv) > 1 else 4, 192, 1024
ts = cfg.tokens
batch = dict(
    x=rng.integers(0, cfg.text_vocab_size, size=(B, sx)).astype(np.int32),
    x_lens=np.full(B, sx, np.int32),
    y=rng.integers(0, ts.audio_vocab_size, size=(B, sy, 4)).astype(np.int32),
    y_lens=np.full(B, sy, np.int32))
toks = B * sy


def bench(step, p, s, label, n=10):
    p, s, m = step(p, s, batch, jax.random.PRNGKey(1))
    _ = float(m["loss"])
    log(f"{label}: compiled")
    t0 = time.time()
    for i in range(n):
        p, s, m = step(p, s, batch, jax.random.PRNGKey(i))
    _ = float(m["loss"])
    el = (time.time() - t0) / n
    log(f"{label}: {el*1000:.1f} ms/step, {toks/el:.0f} codec tokens/s")
    return el


# snapshot + unstack BEFORE variant A runs (its donate_argnums deletes
# `params`)
L = cfg.num_layers
snap = jax.tree.map(lambda a: np.asarray(a), params)
layers_list = tuple(
    jax.tree.map(lambda a: a[l], snap["decoder"]["layers"]) for l in range(L)
)
params_u = {k: v for k, v in snap.items() if k != "decoder"}
params_u["decoder"] = dict(
    layers_list=layers_list,
    final_ln_w=snap["decoder"]["final_ln_w"],
    final_ln_b=snap["decoder"]["final_ln_b"],
)
# NOTE: params_u stays host-side (numpy) until variant A is done — a second
# resident fp32 copy of the 830M params would OOM the 16 GB chip.

# ---------------- variant A: production scan step ----------------
stepA = make_train_step(cfg, tcfg, opt)
elA = bench(stepA, params, opt.init(params), "A scan-stacked")
params_u = jax.tree.map(jnp.asarray, params_u)

dtype = jnp.bfloat16
nhead, rate = cfg.nhead, cfg.trm_dropout


def layer_apply(h, lp, bias, keys):
    k1, k2, k3 = keys
    hn = trf.layer_norm(h, lp["ln1_w"], lp["ln1_b"])
    qkv = hn @ lp["qkv_w"].astype(dtype) + lp["qkv_b"].astype(dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    attn = trf._attend(trf._split_heads(q, nhead), trf._split_heads(k, nhead),
                       trf._split_heads(v, nhead), bias)
    attn = trf._merge_heads(attn) @ lp["out_w"].astype(dtype) + lp["out_b"].astype(dtype)
    h = h + trf._dropout(attn, rate, k1, False)
    hn = trf.layer_norm(h, lp["ln2_w"], lp["ln2_b"])
    ff = jax.nn.relu(hn @ lp["ffn1_w"].astype(dtype) + lp["ffn1_b"].astype(dtype))
    ff = trf._dropout(ff, rate, k2, False)
    ff = ff @ lp["ffn2_w"].astype(dtype) + lp["ffn2_b"].astype(dtype)
    return h + trf._dropout(ff, rate, k3, False)


layer_apply_r = jax.checkpoint(layer_apply)


def loss_fn_u(p, b, rng):
    h, bias, r_trm = ssr_model.ssr_embed(p, cfg, b, deterministic=False, rng=rng)
    h = h.astype(dtype)
    bias = bias.astype(jnp.float32)
    key = r_trm
    for lp in p["decoder"]["layers_list"]:
        key, k1, k2, k3 = jax.random.split(key, 4)
        h = layer_apply_r(h, lp, bias, (k1, k2, k3))
    h = trf.layer_norm(h, p["decoder"]["final_ln_w"], p["decoder"]["final_ln_b"])
    out = ssr_model.ssr_loss_from_hidden(
        p, cfg, h[:, b["x"].shape[1]:], b,
        predict_mask_token=True, predict_all=False)
    return out["loss"], out


grad_u = jax.value_and_grad(loss_fn_u, has_aux=True)


def train_step_u(p, s, b, rng):
    (loss, out), grads = grad_u(p, b, rng)
    updates, s2 = opt.update(grads, s, p)
    p2 = jax.tree.map(lambda a, u: a + u.astype(a.dtype), p, updates)
    return p2, s2, dict(loss=loss, ntokens=out["effective_ntoken"])


stepB = jax.jit(train_step_u, donate_argnums=(0, 1))
elB = bench(stepB, params_u, opt.init(params_u), "B unrolled")
log(f"speedup B vs A: {elA/elB:.3f}x")


# ------- variant C: STACKED storage, unrolled forward via static slices ----
def loss_fn_c(p, b, rng):
    h, bias, r_trm = ssr_model.ssr_embed(p, cfg, b, deterministic=False, rng=rng)
    h = h.astype(dtype)
    bias = bias.astype(jnp.float32)
    key = r_trm
    for l in range(L):
        lp = jax.tree.map(lambda a: a[l], p["decoder"]["layers"])
        key, k1, k2, k3 = jax.random.split(key, 4)
        h = layer_apply_r(h, lp, bias, (k1, k2, k3))
    h = trf.layer_norm(h, p["decoder"]["final_ln_w"], p["decoder"]["final_ln_b"])
    out = ssr_model.ssr_loss_from_hidden(
        p, cfg, h[:, b["x"].shape[1]:], b,
        predict_mask_token=True, predict_all=False)
    return out["loss"], out


grad_c = jax.value_and_grad(loss_fn_c, has_aux=True)


def train_step_c(p, s, b, rng):
    (loss, out), grads = grad_c(p, b, rng)
    updates, s2 = opt.update(grads, s, p)
    p2 = jax.tree.map(lambda a, u: a + u.astype(a.dtype), p, updates)
    return p2, s2, dict(loss=loss, ntokens=out["effective_ntoken"])


params_c = jax.tree.map(jnp.asarray, snap)
stepC = jax.jit(train_step_c, donate_argnums=(0, 1))
elC = bench(stepC, params_c, opt.init(params_c), "C stacked-unrolled")
log(f"speedup C vs A: {elA/elC:.3f}x")
