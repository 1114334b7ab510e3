"""Benchmark: real-time factor (RTF) of English TTS-style generation on one
TPU chip — the BASELINE.md headline metric (target: >=5x real time per chip).

Runs the flagship 830M SSR LM (z_scripts/e830M.sh geometry) with CFG batch
[cond, uncond] and the compiled while-loop decoder, generating a fixed number
of codec frames (eog disabled via a logit bias so the measured loop length is
deterministic), then decodes frames to waveform with the wmencodec SEANet
decoder. RTF = generated audio seconds / wall-clock seconds.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ssr_speech_tpu.config import CodecConfig, DecodeConfig, SSRModelConfig
    from ssr_speech_tpu.inference import decode as dec_mod
    from ssr_speech_tpu.models import ssr as ssr_model
    from ssr_speech_tpu.models.codec import wmencodec as wm

    cfg = SSRModelConfig(d_model=2048, nhead=16, num_layers=16,
                         n_codebooks=4, text_vocab_size=120)
    codec_cfg = CodecConfig()
    ts = cfg.tokens

    key = jax.random.PRNGKey(0)
    params = ssr_model.init_ssr(key, cfg)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    # disable EOG/mask-token emission so the generated length is exactly the
    # configured budget (random weights would otherwise stop stochastically)
    bias = params["head2_b"]
    bias = bias.at[:, ts.eog].set(-1e9)
    params["head2_b"] = bias

    codec_params = wm.init_wmencodec(jax.random.PRNGKey(1), codec_cfg)
    codec_params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), codec_params)

    seconds = 8.0
    frames = int(seconds * codec_cfg.frame_rate)  # 50 Hz
    rng = np.random.default_rng(0)
    sx = 120
    x = rng.integers(0, cfg.text_vocab_size - 1, size=(sx,))
    prompt_frames = 150  # 3 s prompt
    y = rng.integers(0, ts.audio_vocab_size, size=(cfg.n_codebooks, prompt_frames))
    mask = [(prompt_frames, prompt_frames)]  # TTS: generate pure future

    dec = DecodeConfig(
        aug_text=True, cfg_stride=5, cfg_coef=1.5, top_k=0, top_p=0.8,
        temperature=1.0, stop_repetition=-1, cfg_pretrained=True,
        max_gen_per_span=frames + cfg.n_codebooks,
        length_cap_mult=10_000,
    )

    def run(seed):
        codes, marks, _, _ = dec_mod.generate(
            params, cfg, dec, x, y, mask, jax.random.PRNGKey(seed),
            tmax=1024, dtype_name="bfloat16",
        )
        wav = np.asarray(wm.decode(codec_params, jnp.asarray(codes), codec_cfg))
        return wav, codes

    # warmup/compile
    wav, codes = run(0)
    gen_frames = codes.shape[2] - prompt_frames
    # timed runs
    n_runs = 2
    t0 = time.perf_counter()
    for i in range(n_runs):
        wav, codes = run(i + 1)
    elapsed = (time.perf_counter() - t0) / n_runs

    audio_sec = gen_frames / codec_cfg.frame_rate
    rtf = audio_sec / elapsed

    # aggregate serving throughput: 8 seed-batched chains in ONE compiled
    # loop over a shared prompt cache (the serving capability the reference
    # lacks — it decodes seeds sequentially, inference_v2.py:331-337)
    S = 8

    def run_batch(seed):
        results = dec_mod.generate_batch(
            params, cfg, dec, x, y, mask, jax.random.PRNGKey(seed),
            n_samples=S, tmax=1024, dtype_name="bfloat16",
        )
        return np.asarray(results[0][0])  # force device->host sync

    run_batch(0)
    t0 = time.perf_counter()
    for i in range(n_runs):
        run_batch(i + 1)
    elapsed_b = (time.perf_counter() - t0) / n_runs
    agg_rtf = S * audio_sec / elapsed_b

    print(json.dumps({
        "metric": "en TTS RTF (audio sec generated / wall sec, 830M LM + codec, CFG stride 5, 1 chip)",
        "value": round(rtf, 3),
        "unit": "x realtime",
        "vs_baseline": round(rtf / 5.0, 3),
        "aggregate_rtf_s8": round(agg_rtf, 2),
        "aggregate_note": "8 seed-batched chains, shared prompt cache, one compiled loop",
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # still emit the one-line contract on failure
        print(json.dumps({
            "metric": f"en TTS RTF — BENCH FAILED: {type(e).__name__}: {e}",
            "value": 0.0,
            "unit": "x realtime",
            "vs_baseline": 0.0,
        }))
        raise
