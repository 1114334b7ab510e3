"""Streaming TTS on one TPU chip: time-to-first-audio vs the offline path.

830M LM + full-geometry causal codec, 8 s TTS (400 frames), 25-frame
(0.5 s) emission chunks.
"""
import dataclasses, time, sys
t00 = time.time()
def log(m): print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, '/root/repo')
from ssr_speech_tpu.config import CodecConfig, DecodeConfig, SSRModelConfig
from ssr_speech_tpu.models import ssr as ssr_model
from ssr_speech_tpu.models.codec import wmencodec as wm
from ssr_speech_tpu.inference import stream as stream_mod

cfg = SSRModelConfig(d_model=2048, nhead=16, num_layers=16, n_codebooks=4,
                     text_vocab_size=120)
ts = cfg.tokens
codec_cfg = CodecConfig()
codec_cfg = dataclasses.replace(
    codec_cfg, seanet=dataclasses.replace(codec_cfg.seanet, causal=True))
params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
params["head2_b"] = params["head2_b"].at[:, ts.eog].set(-1e9)
codec_params = wm.init_wmencodec(jax.random.PRNGKey(1), codec_cfg)
_ = np.asarray(params["head2_b"]); log("params ready")

rng = np.random.default_rng(0)
frames = 400  # 8 s at 50 Hz
T = 150       # 3 s prompt
MULT = 4
sx = (T + frames) // MULT + 1
x = rng.integers(0, cfg.text_vocab_size - 1, size=(sx,))
y = rng.integers(0, ts.audio_vocab_size, size=(4, T))
dec = DecodeConfig(aug_text=True, cfg_stride=5, top_k=0, top_p=0.8,
                   stop_repetition=-1, cfg_pretrained=True,
                   max_gen_per_span=frames + 8, length_cap_mult=MULT)

streamer = stream_mod.TTSStreamer(params, cfg, dec, codec_params, codec_cfg,
                                  chunk_frames=25, sx_pad=256, p_pad=256)
_ = list(streamer.stream(x, y, jax.random.PRNGKey(0)))  # compile everything
log("compiled (one warm stream done)")

t0 = time.time()
ttfa = None
n_chunks, n_frames = 0, 0
for codes_chunk, wav_chunk in streamer.stream(x, y, jax.random.PRNGKey(1)):
    if ttfa is None:
        ttfa = time.time() - t0
    n_chunks += 1
    n_frames += codes_chunk.shape[1]
total = time.time() - t0
audio_s = n_frames / 50
log(f"streamed {n_chunks} chunks / {n_frames} frames ({audio_s:.1f}s audio)")
log(f"time-to-first-audio {ttfa*1000:.0f} ms (12-frame first chunk); "
    f"total {total:.2f}s -> RTF {audio_s/total:.2f}x; "
    f"offline TTFA would be ~{total:.1f}s (full generate+decode)")
