"""Profile the production 830M train step and itemize device time by op
category (the VERDICT-r3 ask: attribute the remaining ms to named costs).

Runs the exact operating point (B=8, bf16 moments, rbg keys, dots_masks
remat — BENCHMARKS.md "Training"), traces a few steps with
``jax.profiler.trace``, then parses the xplane via
``jax.profiler.ProfileData`` and aggregates TensorCore event durations by
HLO category (fusion kinds, custom-calls = flash attention kernels, copies,
dynamic-update-slice, RNG, ...).

Usage: python tools/train_trace_probe.py [outdir]
Env:   PROBE_B / PROBE_SX / PROBE_SY / PROBE_RNG / PROBE_REMAT override the
       operating point (defaults 8 / 192 / 1024 / rbg / dots_masks).
"""
import collections
import os
import re
import sys
import time

t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, "/root/repo")
from ssr_speech_tpu.config import OptimConfig, SSRModelConfig, TrainConfig
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.training import optim as optimlib
from ssr_speech_tpu.training.trainer import make_train_step

B = int(os.environ.get("PROBE_B", 8))
SX = int(os.environ.get("PROBE_SX", 192))
SY = int(os.environ.get("PROBE_SY", 1024))
N_TRACE = 3


def categorize(name: str) -> str:
    """Map a TensorCore event name to a coarse cost category.

    Event names are full HLO instruction texts
    (``%lhs_name = type[shape]{layout} opcode(%operand1, ...)``), so naive
    substring checks mis-attribute: a fusion CONSUMING a ``%copy-done.N``
    operand is not a copy (this bug inflated the r4 'copies'/'CE' slices).
    Classify on the lhs name + the opcode only."""
    n = name.lower()
    lhs, _, rest = n.partition(" = ")
    lhs = lhs.lstrip("%")
    m = re.search(r"[\]}]\s*([a-z][a-z0-9_-]*)\(", rest)
    opcode = m.group(1) if m else rest.split("(")[0].strip()
    if opcode in ("custom-call", "tpu_custom_call") or (
            opcode == "fusion" and ("flash" in lhs or "splash" in lhs
                                    or "pallas" in lhs)):
        return "pallas kernel (attn/CE)"
    if "flash" in lhs or "splash" in lhs:
        return "pallas kernel (attn/CE)"
    if opcode.startswith("copy") or lhs.startswith("copy"):
        return "copies"
    if "dynamic-update-slice" in opcode or lhs.startswith(
            "dynamic-update-slice"):
        return "dynamic-update-slice"
    if "rng" in opcode or lhs.startswith("rng"):
        return "rng"
    if opcode in ("all-reduce", "all-gather", "reduce-scatter",
                  "collective-permute"):
        return "collectives"
    if opcode in ("convolution", "dot"):
        return "bare matmul"
    if opcode == "fusion":
        # split matmul-bearing fusions from pure elementwise ones: XLA names
        # output fusions after their root + key interior ops
        if "convolution" in lhs or "dot" in lhs:
            return "matmul fusion"
        return "elementwise fusion"
    if "infeed" in opcode or "outfeed" in opcode:
        return "in/outfeed"
    return "other"


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace"
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(0)
    cfg = SSRModelConfig(
        d_model=2048, nhead=16, num_layers=16, n_codebooks=4,
        text_vocab_size=120,
        attn_impl=os.environ.get("PROBE_ATTN", "flash"),
        remat=os.environ.get("PROBE_REMAT", "dots_masks"),
        ce_impl=os.environ.get("PROBE_CE", "unfused"))
    tcfg = TrainConfig(precision="bfloat16",
                       optim=OptimConfig(optimizer_name="scaledadam",
                                         clipping_scale=2.0,
                                         moments_dtype="bfloat16"))
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
    opt, _ = optimlib.build_optimizer(tcfg.optim)
    opt_state = opt.init(params)
    ts = cfg.tokens
    batch = jax.device_put(dict(
        x=rng.integers(0, cfg.text_vocab_size, (B, SX)).astype(np.int32),
        x_lens=np.full(B, SX, np.int32),
        y=rng.integers(0, ts.audio_vocab_size, (B, SY, 4)).astype(np.int32),
        y_lens=np.full(B, SY, np.int32)))
    key = jax.random.key(1, impl=os.environ.get("PROBE_RNG", "rbg"))
    step = make_train_step(cfg, tcfg, opt)
    log("compiling/warming")
    p2, s2, m = step(params, opt_state, batch, key)
    float(m["loss"])
    p2, s2, m = step(p2, s2, batch, key)
    float(m["loss"])
    log("tracing")
    with jax.profiler.trace(outdir):
        for i in range(N_TRACE):
            p2, s2, m = step(p2, s2, batch, jax.random.fold_in(key, i))
        float(m["loss"])
    log("parsing")
    # newest xplane.pb under outdir
    pbs = []
    for root, _, fs in os.walk(outdir):
        pbs += [os.path.join(root, f) for f in fs if f.endswith("xplane.pb")]
    if not pbs:
        raise SystemExit("no xplane.pb produced — profiling unsupported here")
    pb = max(pbs, key=os.path.getmtime)
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(pb, "rb").read())
    # Only the serial 'XLA Ops' line sums to the wall step time; 'Async
    # XLA Ops' events (DMA copy-start/...-done) OVERLAP compute — their
    # durations span the async lifetime and must not be added to it.
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
    log(f"serial device time {total:.1f} ms over {N_TRACE} steps "
        f"= {per_step:.1f} ms/step attributed "
        f"(async DMA lifetime, overlapped: {async_total/N_TRACE:.0f} "
        f"ms/step)")
    for cat, ms in cats.most_common():
        log(f"  {cat:26s} {ms/N_TRACE:8.2f} ms/step "
            f"({100*ms/total:5.1f}%)")
    log("top 15 individual ops:")
    for name, ms in tops.most_common(15):
        log(f"  {ms/N_TRACE:8.2f} ms/step  {name[:90]}")


if __name__ == "__main__":
    main()
