"""Codec-GAN (wmcompression) train-step throughput on one TPU chip:
full-geometry wmencodec + MS-STFT discriminator, B x 2 s batches."""
import time, sys
t00 = time.time()
def log(m): print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, '/root/repo')
from ssr_speech_tpu.config import CodecConfig
from ssr_speech_tpu.models.codec import wmencodec as wm
from ssr_speech_tpu.training import codec_trainer

cfg = CodecConfig()
state, opts = codec_trainer.init_codec_train_state(jax.random.PRNGKey(0), cfg)
step = codec_trainer.make_codec_train_step(cfg, opts)
log("state ready")

rng = np.random.default_rng(0)
hop = cfg.hop_length
for B in [8, 16]:
    T = 2 * cfg.sample_rate
    T = (T // hop) * hop
    frames = T // hop
    wav = (rng.normal(size=(B, T, 1)) * 0.1).astype(np.float32)
    labels, keep = wm.sample_watermark_mask(rng, B, frames, hop)
    state, m = step(state, jnp.asarray(wav), jnp.asarray(labels),
                    jnp.asarray(keep))
    _ = float(m["g_loss"] if "g_loss" in m else list(m.values())[0])
    log(f"B={B} compiled")
    t0 = time.time(); n = 10
    for i in range(n):
        state, m = step(state, jnp.asarray(wav), jnp.asarray(labels),
                        jnp.asarray(keep))
    _ = float(list(m.values())[0])
    el = (time.time() - t0) / n
    audio_s = B * T / cfg.sample_rate
    log(f"B={B}: {el*1000:.0f} ms/step, {audio_s/el:.0f} audio-sec/s "
        f"({audio_s:.0f}s audio per step)")
