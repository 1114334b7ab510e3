"""830M train-step probe: attention impl x remat policy, plus MFU.

Usage: python tools/flash_train_probe.py [variant ...]
Variants: einsum_full (r2 baseline: einsum attention, full per-layer remat),
flash_none (flash attention, no remat), flash_dots (flash attention, remat
with the dots_saveable policy: matmul outputs saved, elementwise recomputed
— the policy that OOM'd with einsum attention because it kept the [B,H,S,S]
scores), einsum_dots (control).

MFU vs the v5e bf16 peak (197 TFLOP/s) using 6*N*tokens + the attention
term.
"""
import sys
import time

t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


import jax
import numpy as np

sys.path.insert(0, '/root/repo')
from ssr_speech_tpu.config import OptimConfig, SSRModelConfig, TrainConfig
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.training import optim as optimlib
from ssr_speech_tpu.training.trainer import make_train_step

import os
B, sx, sy = int(os.environ.get("PROBE_B", 4)), 192, 1024


def run(name):
    attn_impl, remat = dict(
        einsum_full=("einsum", "full"), flash_none=("flash", "none"),
        flash_dots=("flash", "dots"), einsum_dots=("einsum", "dots"),
        flash_mixed=("flash", "mixed"),  # every other layer un-rematted
    )[name]
    rng = np.random.default_rng(0)
    cfg = SSRModelConfig(d_model=2048, nhead=16, num_layers=16, n_codebooks=4,
                         text_vocab_size=120, attn_impl=attn_impl,
                         remat=remat)
    tcfg = TrainConfig(precision="bfloat16",
                       optim=OptimConfig(optimizer_name="scaledadam",
                                         clipping_scale=2.0))
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
    n_params = ssr_model.param_count(params)
    opt, _ = optimlib.build_optimizer(tcfg.optim)
    opt_state = opt.init(params)
    step = make_train_step(cfg, tcfg, opt)
    ts = cfg.tokens
    batch = dict(
        x=rng.integers(0, cfg.text_vocab_size, size=(B, sx)).astype(np.int32),
        x_lens=np.full(B, sx, np.int32),
        y=rng.integers(0, ts.audio_vocab_size, size=(B, sy, 4)).astype(np.int32),
        y_lens=np.full(B, sy, np.int32))
    log(f"{name}: compiling")
    try:
        params, opt_state, m = step(params, opt_state, batch, jax.random.PRNGKey(1))
        loss0 = float(m["loss"])
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return
    log(f"{name}: compiled, loss {loss0:.4f}")
    t0 = time.time()
    n = 10
    for i in range(n):
        params, opt_state, m = step(params, opt_state, batch, jax.random.PRNGKey(i))
    _ = float(m["loss"])
    el = (time.time() - t0) / n
    toks = B * (sx + sy)
    S = sx + sy
    flops = 6 * n_params * toks + 12 * B * S * S * 2048
    mfu = flops / el / 197e12
    log(f"{name}: step {el*1000:.1f} ms, {B*sy/el:.0f} codec tok/s, "
        f"MFU {mfu*100:.1f}% (est {flops/1e12:.1f} TFLOP/step)")


for name in (sys.argv[1:] or ["einsum_full", "flash_dots"]):
    run(name)
