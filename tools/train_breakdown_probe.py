"""Where do the 385 ms of the 830M flash/dots train step go?

One PHASE per process (the 16 GB chip cannot hold the fwd executable, the
bare-grad executable, the optimizer state, and the full step at once; the
persistent compile cache makes multi-process cheap):

  fwd     jitted loss forward only
  grad    jitted bare grad (no optimizer state allocated)
  optim   ScaledAdam update on synthetic grads + the NaN finite-check
  step    the full production train step (reference total)

Usage: python tools/train_breakdown_probe.py <phase> [remat_mode]
e.g.   for p in fwd grad optim step; do python tools/train_breakdown_probe.py $p dots; done

The deltas bound what each phase can win: if grad - 3*fwd is large the
dots_saveable recompute tax is visible; if step - grad - optim is large the
glue (where-apply, metrics) is worth attention.
"""
import os
import sys
import time

t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')
from ssr_speech_tpu.config import OptimConfig, SSRModelConfig, TrainConfig
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.training import optim as optimlib
from ssr_speech_tpu.training.trainer import make_train_step

B = int(os.environ.get("PROBE_B", 4))
sx = int(os.environ.get("PROBE_SX", 192))
sy = int(os.environ.get("PROBE_SY", 1024))
N = 10


def _sync(out):
    # block_until_ready is unreliable on the experimental axon backend
    # (returns before execution); a host pull of one element is a true sync
    return float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])


def bench(fn, *args, n=N):
    out = fn(*args)  # compile
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        # rebind (not append): a grad-sized output pytree is 3.3 GB — keeping
        # all n of them OOMs the chip; in-order execution still serializes
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / n


def main(phase, remat):
    rng = np.random.default_rng(0)
    cfg = SSRModelConfig(d_model=2048, nhead=16, num_layers=16, n_codebooks=4,
                         text_vocab_size=120,
                         attn_impl=os.environ.get("PROBE_ATTN", "flash"),
                         remat=remat,
                         ce_impl=os.environ.get("PROBE_CE", "unfused"))
    tcfg = TrainConfig(precision="bfloat16",
                       optim=OptimConfig(
                           optimizer_name="scaledadam", clipping_scale=2.0,
                           moments_dtype=os.environ.get("PROBE_MOMENTS",
                                                        "float32")))
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
    n_params = ssr_model.param_count(params)
    opt, _ = optimlib.build_optimizer(tcfg.optim)
    ts = cfg.tokens
    batch = jax.device_put(dict(
        x=rng.integers(0, cfg.text_vocab_size, size=(B, sx)).astype(np.int32),
        x_lens=np.full(B, sx, np.int32),
        y=rng.integers(0, ts.audio_vocab_size, size=(B, sy, 4)).astype(np.int32),
        y_lens=np.full(B, sy, np.int32)))
    # PROBE_RNG=rbg: hardware-friendly PRNG for the dropout masks (threefry
    # mask generation measured at 24% of the fwd at 830M)
    key = jax.random.key(1, impl=os.environ.get("PROBE_RNG", "threefry2x32"))

    deterministic = os.environ.get("PROBE_DET", "0") == "1"

    def loss_fn(params, batch, rng):
        out = ssr_model.ssr_forward(
            params, cfg, batch, deterministic=deterministic, rng=rng,
            compute_dtype=jnp.bfloat16, unroll=True, remat=remat)
        return out["loss"]

    if phase == "fwd":
        t = bench(jax.jit(loss_fn), params, batch, key)
        log(f"[{remat}] fwd          {t*1000:7.1f} ms")
    elif phase == "grad":
        t = bench(jax.jit(jax.grad(loss_fn)), params, batch, key)
        log(f"[{remat}] fwd+bwd      {t*1000:7.1f} ms")
    elif phase == "gradd":
        # donated params -> grads: mirrors the production step's memory
        # behavior (the bare no-donation grad reads ~2x slower from HBM
        # pressure and is NOT representative)
        g = jax.jit(jax.grad(loss_fn), donate_argnums=0)
        p = jax.tree.map(jnp.asarray, params)
        out = g(p, batch, key)
        _sync(out)
        t0 = time.time()
        for _ in range(N):
            out = g(out, batch, key)  # grads stand in for params: same pytree
        _sync(out)
        t = (time.time() - t0) / N
        log(f"[{remat}] fwd+bwd(don) {t*1000:7.1f} ms")
    elif phase == "optim":
        # synthetic grads stand in for the real ones (same shapes/dtypes)
        grads = jax.jit(lambda p: jax.tree.map(
            lambda a: (a * 1e-4).astype(jnp.float32), p))(params)
        finite = jax.jit(lambda gs: jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(gs)])))
        t_fin = bench(finite, grads)
        log(f"[{remat}] finite-check {t_fin*1000:7.1f} ms")
        # donate grads+state like the production step (without donation the
        # extra fp32 copies exceed the 16 GB chip); params stay resident
        opt_state = opt.init(params)
        upd = jax.jit(lambda g, s: opt.update(g, s, params),
                      donate_argnums=(0, 1))
        updates, state = upd(grads, opt_state)
        _sync(updates)
        t0 = time.time()
        for _ in range(N):
            updates, state = upd(updates, state)  # updates stand in as grads
        _sync(updates)
        t = (time.time() - t0) / N
        log(f"[{remat}] optim update {t*1000:7.1f} ms")
    elif phase == "step":
        opt_state = opt.init(params)
        step = make_train_step(cfg, tcfg, opt)
        p2, s2, m = step(params, opt_state, batch, key)  # compile (donating)
        float(m["loss"])
        t0 = time.time()
        for i in range(N):
            p2, s2, m = step(p2, s2, batch, jax.random.fold_in(key, i))
        float(m["loss"])
        t = (time.time() - t0) / N
        S = sx + sy
        flops = 6 * n_params * B * S + 12 * B * S * S * 2048
        log(f"[{remat}] FULL STEP    {t*1000:7.1f} ms  "
            f"({B*sy/t:.0f} codec tok/s, MFU {flops/t/197e12*100:.1f}%)")
    elif phase == "ab_rng":
        # threefry vs rbg dropout keys through the FULL production step,
        # interleaved min-of-groups in ONE process (isolated probes mis-rank
        # elementwise levers — see docs/DESIGN.md "8-bit dropout masks").
        # The jitted step specializes on the key dtype, so the two variants
        # are two executables threading the SAME donated params/opt-state.
        opt_state = opt.init(params)
        step = make_train_step(cfg, tcfg, opt)
        keys = {"threefry2x32": jax.random.key(1, impl="threefry2x32"),
                "rbg": jax.random.key(1, impl="rbg")}
        p2, s2 = params, opt_state
        for name, k in keys.items():
            p2, s2, m = step(p2, s2, batch, k)  # compile both variants
            float(m["loss"])
        groups, per = 4, 5
        best = {name: float("inf") for name in keys}
        for g in range(groups):
            for name, k in keys.items():
                t0 = time.time()
                for i in range(per):
                    p2, s2, m = step(p2, s2, batch,
                                     jax.random.fold_in(k, g * per + i))
                float(m["loss"])
                best[name] = min(best[name], (time.time() - t0) / per)
        S = sx + sy
        flops = 6 * n_params * B * S + 12 * B * S * S * 2048
        for name, t in best.items():
            log(f"[{remat}] STEP rng={name:13s} {t*1000:7.1f} ms  "
                f"({B*sy/t:.0f} codec tok/s, MFU {flops/t/197e12*100:.1f}%)")
    elif phase == "ab_remat":
        # remat policy A/B through the FULL production step, interleaved
        # min-of-groups in ONE process: "dots" (recompute dropout in bwd)
        # vs "dots_masks" (save the tagged bool masks, ~1 GB at B=8).
        # PROBE_RNG sets the key impl for both variants.
        variants = {}
        for rm in ("dots", "dots_masks"):
            vcfg = SSRModelConfig(
                d_model=2048, nhead=16, num_layers=16, n_codebooks=4,
                text_vocab_size=120, attn_impl=cfg.attn_impl, remat=rm)
            variants[rm] = make_train_step(vcfg, tcfg, opt)
        opt_state = opt.init(params)
        key = jax.random.key(1, impl=os.environ.get("PROBE_RNG", "rbg"))
        p2, s2 = params, opt_state
        for name, stepf in variants.items():
            p2, s2, m = stepf(p2, s2, batch, key)  # compile both
            float(m["loss"])
            log(f"compiled {name}")
        groups, per = 4, 5
        best = {name: float("inf") for name in variants}
        for g in range(groups):
            for name, stepf in variants.items():
                t0 = time.time()
                for i in range(per):
                    p2, s2, m = stepf(p2, s2, batch,
                                      jax.random.fold_in(key, g * per + i))
                float(m["loss"])
                best[name] = min(best[name], (time.time() - t0) / per)
        S = sx + sy
        flops = 6 * n_params * B * S + 12 * B * S * S * 2048
        for name, t in best.items():
            log(f"[{name}] STEP {t*1000:7.1f} ms  "
                f"({B*sy/t:.0f} codec tok/s, MFU {flops/t/197e12*100:.1f}%)")
    elif phase == "ab_attn":
        # flash vs splash attention through the FULL production step
        # (remat from argv, default dots; PROBE_RNG default rbg),
        # interleaved min-of-groups in ONE process. Starts with a bare-loss
        # numerics check on identical params/key.
        variants = {}
        for impl in ("flash", "splash"):
            vcfg = SSRModelConfig(
                d_model=2048, nhead=16, num_layers=16, n_codebooks=4,
                text_vocab_size=120, attn_impl=impl, remat=remat)
            variants[impl] = (vcfg, make_train_step(vcfg, tcfg, opt))
        key = jax.random.key(1, impl=os.environ.get("PROBE_RNG", "rbg"))
        losses = {}
        for name, (vcfg, _) in variants.items():
            losses[name] = float(jax.jit(
                lambda p, b, r, c=vcfg: ssr_model.ssr_forward(
                    p, c, b, deterministic=True, rng=r,
                    compute_dtype=jnp.bfloat16, unroll=True,
                    remat=remat)["loss"])(params, batch, key))
        rel = abs(losses["flash"] - losses["splash"]) / abs(losses["flash"])
        log(f"bare loss flash {losses['flash']:.4f} splash "
            f"{losses['splash']:.4f} rel diff {rel:.2e}")
        opt_state = opt.init(params)
        p2, s2 = params, opt_state
        for name, (_, stepf) in variants.items():
            p2, s2, m = stepf(p2, s2, batch, key)
            float(m["loss"])
            log(f"compiled {name}")
        groups, per = 4, 5
        best = {name: float("inf") for name in variants}
        for g in range(groups):
            for name, (_, stepf) in variants.items():
                t0 = time.time()
                for i in range(per):
                    p2, s2, m = stepf(p2, s2, batch,
                                      jax.random.fold_in(key, g * per + i))
                float(m["loss"])
                best[name] = min(best[name], (time.time() - t0) / per)
        S = sx + sy
        flops = 6 * n_params * B * S + 12 * B * S * S * 2048
        for name, t in best.items():
            log(f"[{name}] STEP {t*1000:7.1f} ms  "
                f"({B*sy/t:.0f} codec tok/s, MFU {flops/t/197e12*100:.1f}%)")
    elif phase == "ce_check":
        # fused_ce Pallas kernels vs the jnp reference at production head
        # geometry: forward values and VJP cotangents (hidden/w2/b2).
        from ssr_speech_tpu.ops import fused_ce

        K, Nrows, Hh, C = 4, 2 * 1280, 1024, cfg.cardinality
        kr = jax.random.PRNGKey(0)
        k1, k2, k3, k4, k5 = jax.random.split(kr, 5)
        hid = (jax.random.normal(k1, (K, Nrows, Hh)) * 0.3).astype(jnp.bfloat16)
        w2 = (jax.random.normal(k2, (K, Hh, C)) * 0.02).astype(jnp.bfloat16)
        b2 = (jax.random.normal(k3, (K, C)) * 0.01).astype(jnp.bfloat16)
        tgt = jax.random.randint(k4, (K, Nrows), 0, C)
        g = jax.random.normal(k5, (K, Nrows))

        def run(h, w, b):
            return fused_ce.fused_ce_head(h, w, b, tgt)

        (nll_k, hit_k), vjp_k = jax.vjp(run, hid, w2, b2)
        dh_k, dw_k, db_k = vjp_k((g, jnp.zeros_like(g)))
        nll_r, hit_r = fused_ce.reference_ce_head(hid, w2, b2, tgt)

        def run_ref(h, w, b):
            return fused_ce.reference_ce_head(h, w, b, tgt)[0]

        _, vjp_r = jax.vjp(run_ref, hid, w2, b2)
        dh_r, dw_r, db_r = vjp_r(g)
        rel = lambda a, b: float(jnp.max(jnp.abs(a - b))
                                 / (jnp.max(jnp.abs(b)) + 1e-30))
        log(f"nll rel {rel(nll_k, nll_r):.2e}  hits mismatch "
            f"{float(jnp.mean(hit_k != hit_r)):.2e}")
        log(f"dhid rel {rel(dh_k.astype(jnp.float32), dh_r.astype(jnp.float32)):.2e}  "
            f"dw2 rel {rel(dw_k, dw_r):.2e}  db2 rel {rel(db_k, db_r):.2e}")
    elif phase == "ab_ce":
        # unfused vs fused (blocked Pallas) CE head through the FULL
        # production step (attn from PROBE_ATTN default splash, remat argv
        # default dots_masks), interleaved min-of-groups in ONE process.
        variants = {}
        for impl in ("unfused", "fused"):
            vcfg = SSRModelConfig(
                d_model=2048, nhead=16, num_layers=16, n_codebooks=4,
                text_vocab_size=120, attn_impl=cfg.attn_impl, remat=remat,
                ce_impl=impl)
            variants[impl] = (vcfg, make_train_step(vcfg, tcfg, opt))
        key = jax.random.key(1, impl=os.environ.get("PROBE_RNG", "rbg"))
        losses = {}
        for name, (vcfg, _) in variants.items():
            losses[name] = float(jax.jit(
                lambda p, b, r, c=vcfg: ssr_model.ssr_forward(
                    p, c, b, deterministic=True, rng=r,
                    compute_dtype=jnp.bfloat16, unroll=True,
                    remat=remat)["loss"])(params, batch, key))
        rel = abs(losses["unfused"] - losses["fused"]) / abs(losses["unfused"])
        log(f"bare loss unfused {losses['unfused']:.4f} fused "
            f"{losses['fused']:.4f} rel diff {rel:.2e}")
        jax.clear_caches()  # drop the bare-fwd executables before the steps
        # NOTE: needs PROBE_MOMENTS=bfloat16 at B=8 — with fp32 moments a
        # single 830M step is 18.9 GB (9.4 args + 9.3 temp) > 15.75 HBM
        opt_state = opt.init(params)
        p2, s2 = params, opt_state
        for name, (_, stepf) in variants.items():
            p2, s2, m = stepf(p2, s2, batch, key)  # compile both
            float(m["loss"])
            log(f"compiled {name}")
        groups, per = 4, 5
        best = {name: float("inf") for name in variants}
        for g in range(groups):
            for name, (_, stepf) in variants.items():
                t0 = time.time()
                for i in range(per):
                    p2, s2, m = stepf(p2, s2, batch,
                                      jax.random.fold_in(key, g * per + i))
                float(m["loss"])
                best[name] = min(best[name], (time.time() - t0) / per)
                log(f"group {g} {name}: "
                    f"{(time.time() - t0) / per * 1000:.1f} ms")
        S = sx + sy
        flops = 6 * n_params * B * S + 12 * B * S * S * 2048
        for name, t in best.items():
            log(f"[{name}] STEP {t*1000:7.1f} ms  "
                f"({B*sy/t:.0f} codec tok/s, MFU {flops/t/197e12*100:.1f}%)")
    else:
        raise SystemExit(f"unknown phase {phase}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "step",
         sys.argv[2] if len(sys.argv) > 2 else "dots")
