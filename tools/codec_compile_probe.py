"""Bisect the codec-GAN train-step first-compile time (BENCHMARKS.md: ~18 min
one-time on TPU).  Times `jit(...).lower(...).compile()` for each subgraph of
`codec_trainer.make_codec_train_step` separately, then the full step, so the
dominant compile cost is attributable.  Usage:

  python tools/codec_compile_probe.py [piece ...]   # default: all pieces

Pieces: gen_vjp msstftd_fwd adv_vjp mel_grad d_grad disc_scales full
"""
import sys
import time

t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')
from ssr_speech_tpu.config import CodecConfig
from ssr_speech_tpu.models.codec import quantize as q
from ssr_speech_tpu.models.codec import seanet
from ssr_speech_tpu.models.codec import wmencodec as wm
from ssr_speech_tpu.training import codec_trainer
from ssr_speech_tpu.training import discriminators as disc_mod
from ssr_speech_tpu.training import losses as L

PIECES = sys.argv[1:] or [
    "gen_vjp", "msstftd_fwd", "adv_vjp", "mel_grad", "d_grad",
    "disc_scales", "full",
]

cfg = CodecConfig()
sn = cfg.seanet
B = 8
T = (2 * cfg.sample_rate // cfg.hop_length) * cfg.hop_length
frames = T // cfg.hop_length

state, opts = codec_trainer.init_codec_train_state(jax.random.PRNGKey(0), cfg)
state = jax.tree.map(lambda a: np.asarray(a), state)  # keep off-device
log("state ready")

rng = np.random.default_rng(0)
wav = (rng.normal(size=(B, T, 1)) * 0.1).astype(np.float32)
labels, keep = wm.sample_watermark_mask(rng, B, frames, cfg.hop_length)
x = jnp.asarray(wav)
labels_j = jnp.asarray(labels)
keep_j = jnp.asarray(keep)


def timed_compile(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    log(f"{name}: trace+lower {t1-t0:.1f}s, XLA compile {t2-t1:.1f}s")


if "gen_vjp" in PIECES:
    def gen_vjp(wm_p, frozen, xx, ll, kk):
        emb = seanet.encode(frozen["encoder"], xx, sn)
        latents, _ = q.rvq_quantize(frozen["quantizer"], emb)
        latents = jax.lax.stop_gradient(latents)
        masked = xx * kk[..., None]

        def model_fn(p):
            y_pred, mark = seanet.wm_decode(p, latents, ll, masked, sn)
            y_pred = y_pred[:, : xx.shape[1]]
            clean = seanet.detect_watermark_logits(p, xx, sn)
            return y_pred, mark, clean

        (y, mark, clean), vjp_fn = jax.vjp(model_fn, wm_p)
        g, = vjp_fn((jnp.ones_like(y), jnp.ones_like(mark),
                     jnp.ones_like(clean)))
        return jax.tree.map(jnp.sum, g)

    timed_compile("gen_vjp (generator fwd+bwd)", gen_vjp, state.wm_params,
                  state.frozen, x, labels_j, keep_j)

if "msstftd_fwd" in PIECES:
    def ms_fwd(dp, xx):
        logits, fmaps = disc_mod.msstftd_forward(dp, xx)
        return sum(jnp.sum(lg) for lg in logits)

    timed_compile("msstftd_fwd (disc fwd only)", ms_fwd, state.disc_params, x)

if "adv_vjp" in PIECES:
    def adv_two_pullbacks(dp, yy, xx):
        def adv_fn(yp):
            logits_f, fmaps_f = disc_mod.msstftd_forward(dp, yp)
            _, fmaps_r = disc_mod.msstftd_forward(dp, xx)
            adv = sum(L.hinge_gen_loss(lg) for lg in logits_f) / len(logits_f)
            feat = sum(L.feature_matching_loss(ff, fr)
                       for ff, fr in zip(fmaps_f, fmaps_r)) / len(fmaps_f)
            return adv, feat

        (a, f), vjp_fn = jax.vjp(adv_fn, yy)
        g1, = vjp_fn((jnp.ones(()), jnp.zeros(())))
        g2, = vjp_fn((jnp.zeros(()), jnp.ones(())))
        return jnp.sum(g1) + jnp.sum(g2)

    timed_compile("adv_vjp (disc fwd + 2 pullbacks)", adv_two_pullbacks,
                  state.disc_params, x, x)

if "mel_grad" in PIECES:
    def mel_grad(yy, xx):
        v, g = jax.value_and_grad(
            lambda yp: L.multiscale_mel_loss(yp, xx, cfg.sample_rate))(yy)
        return v + jnp.sum(g)

    timed_compile("mel_grad (multiscale mel fwd+bwd)", mel_grad, x, x)

if "d_grad" in PIECES:
    def d_grad(dp, yy, xx):
        def d_loss_fn(p):
            logits_f, _ = disc_mod.msstftd_forward(p, yy)
            logits_r, _ = disc_mod.msstftd_forward(p, xx)
            loss = sum(L.hinge_fake_loss(lf) + L.hinge_real_loss(lr_)
                       for lf, lr_ in zip(logits_f, logits_r))
            return loss / len(logits_f)

        v, g = jax.value_and_grad(d_loss_fn)(dp)
        return v + sum(jnp.sum(leaf) for leaf in jax.tree.leaves(g))

    timed_compile("d_grad (disc loss fwd+bwd)", d_grad, state.disc_params,
                  x, x)

if "disc_scales" in PIECES:
    # compile cost scaling in the number of STFT discriminator scales
    for n in (1, 3, 5):
        dp = dict(subs=state.disc_params["subs"][:n])

        def ms_n(p, xx):
            logits, fmaps = disc_mod.msstftd_forward(p, xx)
            s = sum(jnp.sum(lg) for lg in logits)
            g = jax.grad(lambda v: sum(
                jnp.sum(l2) for l2 in
                disc_mod.msstftd_forward(p, v)[0]))(xx)
            return s + jnp.sum(g)

        timed_compile(f"disc fwd+bwd n_scales={n}", ms_n, dp, x)

if "full" in PIECES:
    step = codec_trainer.make_codec_train_step(cfg, opts)
    t0 = time.time()
    new_state, m = step(jax.tree.map(jnp.asarray, state), x, labels_j, keep_j)
    _ = float(m["g_loss"])
    log(f"full step first call (trace+compile+run): {time.time()-t0:.1f}s")
