"""Roofline the codec-GAN (wmcompression) train step: profile the full-
geometry B=16 x 2 s step on one TPU chip and itemize device time by op
category (same methodology as tools/train_trace_probe.py, which drove the
LM-step 32.5 -> 46.1% MFU chain), plus an MFU / HBM-bandwidth estimate from
the compiled step's XLA cost analysis.

The step under test is ``training.codec_trainer.make_codec_train_step`` —
the reference's wmcompression solver iteration
(audiocraft/audiocraft/solvers/wmcompression.py:97-167): frozen encoder/RVQ,
watermark-decoder fwd+bwd, 5-scale MS-STFT discriminator fwd+bwd (twice: G
and D passes), balancer'd losses, Adam x2, EMA.

Usage: python tools/codec_trace_probe.py [outdir]
Env:   PROBE_B (default 16), PROBE_SEG_S (default 2.0),
       PROBE_DTYPE (float32 | bfloat16, default float32)
"""
import collections
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

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from train_trace_probe import categorize

from ssr_speech_tpu.config import CodecConfig
from ssr_speech_tpu.models.codec import wmencodec as wm
from ssr_speech_tpu.training import codec_trainer

B = int(os.environ.get("PROBE_B", 16))
DTYPE = os.environ.get("PROBE_DTYPE", "float32")
SEG_S = float(os.environ.get("PROBE_SEG_S", 2.0))
N_TRACE = 3


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/codec_trace"
    os.makedirs(outdir, exist_ok=True)
    cfg = CodecConfig()
    hop = cfg.hop_length
    T = (int(SEG_S * cfg.sample_rate) // hop) * hop
    frames = T // hop
    rng = np.random.default_rng(0)

    state, opts = codec_trainer.init_codec_train_state(
        jax.random.PRNGKey(0), cfg)
    step = codec_trainer.make_codec_train_step(cfg, opts, compute_dtype=DTYPE)
    log(f"compute dtype {DTYPE}")
    log("state ready")

    wav = jnp.asarray((rng.normal(size=(B, T, 1)) * 0.1).astype(np.float32))
    labels_np, keep_np = wm.sample_watermark_mask(rng, B, frames, hop)
    labels, keep = jnp.asarray(labels_np), jnp.asarray(keep_np)

    # --- compiled-step cost analysis -> MFU / bandwidth ceiling
    lowered = step.lower(state, wav, labels, keep)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    log(f"XLA cost analysis: {flops/1e12:.2f} TFLOP, "
        f"{bytes_acc/1e9:.1f} GB accessed per step")

    state, m = step(state, wav, labels, keep)
    _ = float(m["g_loss"])
    state, m = step(state, wav, labels, keep)
    _ = float(m["g_loss"])
    log("warm")

    t0 = time.time()
    n = 10
    for _ in range(n):
        state, m = step(state, wav, labels, keep)
    _ = float(m["g_loss"])
    el = (time.time() - t0) / n
    audio_s = B * T / cfg.sample_rate
    # single-chip peaks (bf16 MXU / HBM) — same constants bench.py reports
    # against; fp32 conv FLOPs run at half MXU rate, so show both
    PEAK_BF16 = 275e12
    PEAK_HBM = 1.2e12
    log(f"B={B} {SEG_S:.1f}s: {el*1000:.1f} ms/step, {audio_s/el:.0f} "
        f"audio-sec/s")
    log(f"  model-FLOP utilization {flops/el/PEAK_BF16*100:.1f}% of bf16 "
        f"peak ({flops/el/1e12:.1f} TFLOP/s)")
    log(f"  HBM traffic {bytes_acc/el/1e9:.0f} GB/s "
        f"({bytes_acc/el/PEAK_HBM*100:.1f}% of ~1.2 TB/s)")

    log("tracing")
    with jax.profiler.trace(outdir):
        for _ in range(N_TRACE):
            state, m = step(state, wav, labels, keep)
        _ = float(m["g_loss"])
    log("parsing")
    pbs = []
    for root, _, fs in os.walk(outdir):
        pbs += [os.path.join(root, f) for f in fs if f.endswith("xplane.pb")]
    if not pbs:
        raise SystemExit("no xplane.pb produced — profiling unsupported here")
    pb = max(pbs, key=os.path.getmtime)
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(pb, "rb").read())
    cats = collections.Counter()
    tops = collections.Counter()
    total = async_total = 0.0
    for plane in data.planes:
        if not plane.name.lower().startswith("/device:tpu"):
            continue
        for line in plane.lines:
            if line.name == "XLA Ops":
                for ev in line.events:
                    dur = ev.duration_ns / 1e6
                    cats[categorize(ev.name)] += dur
                    tops[ev.name] += dur
                    total += dur
            elif line.name == "Async XLA Ops":
                async_total += sum(e.duration_ns for e in line.events) / 1e6
    per_step = total / N_TRACE
    log(f"serial device time {per_step:.1f} ms/step attributed "
        f"(async DMA lifetime, overlapped: {async_total/N_TRACE:.0f} ms/step)")
    for cat, ms in cats.most_common():
        log(f"  {cat:26s} {ms/N_TRACE:8.2f} ms/step ({100*ms/total:5.1f}%)")
    log("top 25 individual ops:")
    for name, ms in tops.most_common(25):
        log(f"  {ms/N_TRACE:8.2f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()
