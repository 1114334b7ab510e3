"""Watermark-codec (wmcompression) trainer: GAN + watermark CE + balancer.

Capability parity with reference ``audiocraft/audiocraft/solvers/wmcompression.py``:
  - only the watermark decoder trains; encoder/decoder/quantizer are frozen
    (wmcompression.py:71-73) — here simply excluded from the grad pytree,
  - per step: watermark CE on masked audio + 0.25 x CE on clean audio
    (wmcompression.py:102-106), MS-STFT hinge adversarial + feature matching
    + l1 + multi-scale mel combined by the gradient Balancer with the shipped
    weights adv 4 / feat 4 / l1 0.1 / msspec 2 (config default.yaml:14-24;
    wmcompression.py:120-159),
  - the discriminator trains every step with hinge real/fake losses
    (wmcompression.py:113-117, adversarial/losses.py:89-113),
  - Adam lr 5e-4 betas (0.5, 0.9) (config optim:146-155), EMA of the trained
    weights with decay 0.99 (config optim.ema; optim/ema.py ModuleDictEMA),
  - random watermark-span masking on host (wmencodec.py:206-235, via
    ``models.codec.wmencodec.sample_watermark_mask``).

JAX formulation of the Balancer's K-backward-passes: each balanced loss is a
function of the generator OUTPUT only, so we take K cheap ``jax.grad``s
w.r.t. y_pred, combine them into a single cotangent with the EMA rescaling,
and run ONE pullback through the generator (reference computes K autograd
calls to the output then one ``input.backward(out_grad)``,
balancer.py:90-136 — same math, one compiled program).
"""

from __future__ import annotations

import functools

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import CodecConfig
from ..models.codec import quantize as q
from ..models.codec import seanet
from ..models.codec import wmencodec as wm
from . import discriminators as disc_mod
from . import losses as L

BALANCE_WEIGHTS = {"adv": 4.0, "feat": 4.0, "l1": 0.1, "msspec": 2.0}

# the rest of the reference's selectable loss space (config
# solver/compression/encodec_*.yaml `losses:` weights beyond the shipped
# adv/feat/l1/msspec, specloss.py / stftloss.py) — any subset may be named
# in `balance_weights`
RECON_LOSS_FNS = {
    "l1": lambda yp, x, sr: L.l1_loss(yp, x),
    "l2": lambda yp, x, sr: L.l2_loss(yp, x),
    "msspec": lambda yp, x, sr: L.multiscale_mel_loss(yp, x, sr),
    "mel": lambda yp, x, sr: L.mel_l1_loss(yp, x, sr),
    "mstft": lambda yp, x, sr: L.mrstft_loss(yp, x),
}

# adversarial objective family (reference adversarial/losses.py:200-247,
# selected by `adversarial.loss`): (generator, disc-real, disc-fake)
ADV_LOSS_FNS = {
    "hinge": (L.hinge_gen_loss, L.hinge_real_loss, L.hinge_fake_loss),
    "mse": (L.mse_gen_loss, L.mse_real_loss, L.mse_fake_loss),
}


def _resolve_losses(balance_weights, adv_loss_mode):
    bw = dict(BALANCE_WEIGHTS if balance_weights is None else balance_weights)
    if "adv" not in bw or "feat" not in bw:
        raise ValueError("balance_weights must include 'adv' and 'feat'")
    unknown = [k for k in bw if k not in ("adv", "feat")
               and k not in RECON_LOSS_FNS]
    if unknown:
        raise ValueError(f"unknown loss keys {unknown}; "
                         f"choose from {sorted(RECON_LOSS_FNS)}")
    return bw, ADV_LOSS_FNS[adv_loss_mode]


class CodecTrainState(NamedTuple):
    wm_params: Any  # trainable: the watermark decoder
    frozen: Any  # encoder / decoder / quantizer (no grads)
    disc_params: Any
    g_opt: Any
    d_opt: Any
    balancer: L.BalancerState
    ema_params: Any
    step: jnp.ndarray


def make_optimizers(lr: float = 5e-4):
    g = optax.adam(lr, b1=0.5, b2=0.9)
    d = optax.adam(lr, b1=0.5, b2=0.9)
    return g, d


def init_codec_train_state(key, cfg: CodecConfig, lr: float = 5e-4,
                           pretrained: Optional[Dict[str, Any]] = None,
                           balance_weights: Optional[Dict[str, float]] = None,
                           disc_scales: Optional[int] = None,
                           ) -> Tuple[CodecTrainState, Tuple]:
    """``disc_scales`` < 5 trains against the first N scales of the MS-STFT
    family (reference msstftd.n_ffts config list) — rehearsal/debug sizes."""
    k1, k2 = jax.random.split(key)
    params = pretrained if pretrained is not None else wm.init_wmencodec(k1, cfg)
    wm_params = params["wmdecoder"]
    frozen = dict(encoder=params["encoder"], decoder=params["decoder"],
                  quantizer=params["quantizer"])
    disc_params = disc_mod.init_msstftd(
        k2, n_scales=disc_scales or len(disc_mod.N_FFTS))
    g_opt_t, d_opt_t = make_optimizers(lr)

    @jax.jit
    def _aux_init(wm_p, disc_p):
        # one program for the optimizer states + EMA copy: unjitted these
        # are hundreds of per-leaf zeros/copy dispatches, ~60 s on the
        # tunneled axon backend (tools/codec_init_probe.py)
        return (g_opt_t.init(wm_p), d_opt_t.init(disc_p),
                jax.tree.map(jnp.copy, wm_p))

    g_opt, d_opt, ema = _aux_init(wm_params, disc_params)
    state = CodecTrainState(
        wm_params=wm_params, frozen=frozen, disc_params=disc_params,
        g_opt=g_opt, d_opt=d_opt,
        balancer=L.init_balancer(
            list(BALANCE_WEIGHTS if balance_weights is None
                 else balance_weights)),
        ema_params=ema,
        step=jnp.zeros((), jnp.int32),
    )
    return state, (g_opt_t, d_opt_t)


def make_codec_train_step(cfg: CodecConfig, optimizers, ema_decay: float = 0.99,
                          balance_weights: Optional[Dict[str, float]] = None,
                          adv_loss_mode: str = "hinge",
                          compute_dtype: Optional[str] = None,
                          wm_ce_weight: float = 1.0):
    """``compute_dtype='bfloat16'`` runs the trained subgraphs — watermark
    decoder fwd+bwd, detector, and all four MS-STFT discriminator passes — in
    bf16 activations with f32 MXU accumulation (params, losses, the balancer,
    optimizer states, and the frozen encoder/RVQ stay f32). The step is
    HBM-bandwidth-bound (tools/codec_trace_probe.py roofline), so halving the
    activation traffic is the headline lever; the TPU default in
    ``train_codec``. None/'float32' keeps the reference's full-f32 step."""
    g_opt_t, d_opt_t = optimizers
    sr = cfg.sample_rate
    sn = cfg.seanet
    cd = None if compute_dtype in (None, "float32") else jnp.dtype(compute_dtype)
    cast = (lambda t: t.astype(cd)) if cd is not None else (lambda t: t)
    bw, (gen_loss, real_loss, fake_loss) = _resolve_losses(
        balance_weights, adv_loss_mode)
    recon_keys = [k for k in bw if k not in ("adv", "feat")]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: CodecTrainState, wav: jnp.ndarray,
                   labels: jnp.ndarray, keep: jnp.ndarray):
        """wav [B, T, 1]; labels [B, F] 0/1 watermark spans; keep [B, T]
        1 outside masked regions (wmencodec.py:237-263 forward)."""
        x = wav
        # frozen encoder + quantizer (no_grad in reference, :243-249) —
        # kept f32 so training sees the same codes inference will produce
        emb = seanet.encode(state.frozen["encoder"], x, sn)
        latents, _ = q.rvq_quantize(state.frozen["quantizer"], emb)
        latents = cast(jax.lax.stop_gradient(latents))
        masked_wav = cast(x * keep[..., None])
        x_c = cast(x)

        def model_fn(wm_p):
            y_pred, mark_logits = seanet.wm_decode(wm_p, latents, labels,
                                                   masked_wav, sn)
            y_pred = y_pred[:, : x.shape[1]].astype(x.dtype)
            clean_logits = seanet.detect_watermark_logits(wm_p, x_c, sn)
            return y_pred, mark_logits.astype(x.dtype), \
                clean_logits.astype(x.dtype)

        (y_pred, mark, clean), vjp_fn = jax.vjp(model_fn, state.wm_params)

        # watermark classifier losses (wmcompression.py:102-106; the
        # reference weighs this family 1.0 against the balancer's unit-norm
        # GAN/recon cotangent — ``wm_ce_weight`` scales it, e.g. rehearsal
        # runs where the detector must converge in a few hundred steps)
        def cls_fn(m, c):
            ce = L.cross_entropy(m, labels) + 0.25 * L.cross_entropy(
                c, jnp.zeros(c.shape[:-1], jnp.int32))
            return wm_ce_weight * ce

        cls_loss, (g_mark, g_clean) = jax.value_and_grad(
            cls_fn, argnums=(0, 1))(mark, clean)

        # balanced generator losses, each as f(y_pred) (wmcompression.py:120-141)
        def adv_fn(yp):
            logits_f, fmaps_f = disc_mod.msstftd_forward(state.disc_params,
                                                         cast(yp))
            _, fmaps_r = disc_mod.msstftd_forward(state.disc_params, x_c)
            adv = sum(gen_loss(lg) for lg in logits_f) / len(logits_f)
            feat = sum(
                L.feature_matching_loss(ff, fr)
                for ff, fr in zip(fmaps_f, fmaps_r)
            ) / len(fmaps_f)
            return adv, feat

        (adv_v, feat_v), adv_vjp = jax.vjp(adv_fn, y_pred)
        g_adv, = adv_vjp((jnp.ones(()), jnp.zeros(())))
        g_feat, = adv_vjp((jnp.zeros(()), jnp.ones(())))
        losses = dict(adv=adv_v, feat=feat_v)
        grads_out = dict(adv=g_adv, feat=g_feat)
        for k in recon_keys:
            losses[k], grads_out[k] = jax.value_and_grad(
                lambda yp, k=k: RECON_LOSS_FNS[k](yp, x, sr))(y_pred)
        cot, new_bal, g_loss = L.balancer_cotangent(
            state.balancer, grads_out, bw, losses)

        g_wm, = vjp_fn((cot, g_mark, g_clean))
        g_updates, new_g_opt = g_opt_t.update(g_wm, state.g_opt, state.wm_params)
        new_wm = optax.apply_updates(state.wm_params, g_updates)

        # discriminator step (every step, adversarial.every=1;
        # wmcompression.py:113-117)
        y_det = cast(jax.lax.stop_gradient(y_pred))

        def d_loss_fn(dp):
            logits_f, _ = disc_mod.msstftd_forward(dp, y_det)
            logits_r, _ = disc_mod.msstftd_forward(dp, x_c)
            loss = sum(
                fake_loss(lf) + real_loss(lr_)
                for lf, lr_ in zip(logits_f, logits_r)
            )
            return loss / len(logits_f)

        d_loss, g_d = jax.value_and_grad(d_loss_fn)(state.disc_params)
        d_updates, new_d_opt = d_opt_t.update(g_d, state.d_opt, state.disc_params)
        new_disc = optax.apply_updates(state.disc_params, d_updates)

        # EMA of trained weights (optim/ema.py:40, decay 0.99 every step)
        new_ema = jax.tree.map(
            lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
            state.ema_params, new_wm,
        )

        metrics = dict(cls_loss=cls_loss / wm_ce_weight, d_loss=d_loss,
                       g_loss=g_loss, **losses)
        new_state = CodecTrainState(
            wm_params=new_wm, frozen=state.frozen, disc_params=new_disc,
            g_opt=new_g_opt, d_opt=new_d_opt, balancer=new_bal,
            ema_params=new_ema, step=state.step + 1,
        )
        return new_state, metrics

    return train_step


def make_compression_train_step(cfg: CodecConfig, optimizers,
                                straight_through: bool = True,
                                balance_weights: Optional[Dict[str, float]] = None,
                                adv_loss_mode: str = "hinge",
                                compute_dtype: Optional[str] = None):
    """Plain EnCodec trainer step (reference ``solvers/compression.py:27``):
    same adversarial + reconstruction losses, no watermark head, training the
    autoencoder itself.

    Note: this fork's quantizer has both the EMA codebook update and the
    straight-through estimator commented out (core_vq.py:205-217, :316-318),
    which blocks encoder gradients entirely; ``straight_through=True``
    restores the standard ST estimator so encoder+decoder train — set False
    for strict reference behavior (decoder-only gradients).
    """
    g_opt_t, d_opt_t = optimizers
    sr = cfg.sample_rate
    sn = cfg.seanet
    cd = None if compute_dtype in (None, "float32") else jnp.dtype(compute_dtype)
    cast = (lambda t: t.astype(cd)) if cd is not None else (lambda t: t)
    bw, (gen_loss, real_loss, fake_loss) = _resolve_losses(
        balance_weights, adv_loss_mode)
    recon_keys = [k for k in bw if k not in ("adv", "feat")]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: CodecTrainState, wav: jnp.ndarray):
        x = wav
        x_c = cast(x)

        trainable = dict(encoder=state.frozen["encoder"],
                         decoder=state.frozen["decoder"])
        quantizer = state.frozen["quantizer"]

        def model_fn(tp):
            emb = seanet.encode(tp["encoder"], x_c, sn)
            # RVQ nearest-code search in f32 (bf16 distance ties are noisy)
            latents, _ = q.rvq_quantize(quantizer, emb.astype(x.dtype))
            if straight_through:
                latents = emb + jax.lax.stop_gradient(
                    latents.astype(emb.dtype) - emb)
            else:
                latents = cast(jax.lax.stop_gradient(latents))
            y_pred = seanet.decode(tp["decoder"], latents, sn)
            return y_pred[:, : x.shape[1]].astype(x.dtype)

        y_pred, vjp_fn = jax.vjp(model_fn, trainable)

        def adv_fn(yp):
            logits_f, fmaps_f = disc_mod.msstftd_forward(state.disc_params,
                                                         cast(yp))
            _, fmaps_r = disc_mod.msstftd_forward(state.disc_params, x_c)
            adv = sum(gen_loss(lg) for lg in logits_f) / len(logits_f)
            feat = sum(L.feature_matching_loss(ff, fr)
                       for ff, fr in zip(fmaps_f, fmaps_r)) / len(fmaps_f)
            return adv, feat

        (adv_v, feat_v), adv_vjp = jax.vjp(adv_fn, y_pred)
        g_adv, = adv_vjp((jnp.ones(()), jnp.zeros(())))
        g_feat, = adv_vjp((jnp.zeros(()), jnp.ones(())))
        losses = dict(adv=adv_v, feat=feat_v)
        grads_out = dict(adv=g_adv, feat=g_feat)
        for k in recon_keys:
            losses[k], grads_out[k] = jax.value_and_grad(
                lambda yp, k=k: RECON_LOSS_FNS[k](yp, x, sr))(y_pred)
        cot, new_bal, g_loss = L.balancer_cotangent(
            state.balancer, grads_out, bw, losses)
        g_tr, = vjp_fn(cot)

        # reuse the generator optimizer state on the (encoder, decoder) tree
        g_updates, new_g_opt = g_opt_t.update(g_tr, state.g_opt, trainable)
        new_tr = optax.apply_updates(trainable, g_updates)

        y_det = cast(jax.lax.stop_gradient(y_pred))

        def d_loss_fn(dp):
            logits_f, _ = disc_mod.msstftd_forward(dp, y_det)
            logits_r, _ = disc_mod.msstftd_forward(dp, x_c)
            loss = sum(fake_loss(lf) + real_loss(lr_)
                       for lf, lr_ in zip(logits_f, logits_r))
            return loss / len(logits_f)

        d_loss, g_d = jax.value_and_grad(d_loss_fn)(state.disc_params)
        d_updates, new_d_opt = d_opt_t.update(g_d, state.d_opt, state.disc_params)
        new_disc = optax.apply_updates(state.disc_params, d_updates)

        new_frozen = dict(encoder=new_tr["encoder"], decoder=new_tr["decoder"],
                          quantizer=quantizer)
        metrics = dict(d_loss=d_loss, g_loss=g_loss, **losses)
        new_state = CodecTrainState(
            wm_params=state.wm_params, frozen=new_frozen, disc_params=new_disc,
            g_opt=new_g_opt, d_opt=new_d_opt, balancer=new_bal,
            ema_params=state.ema_params, step=state.step + 1,
        )
        return new_state, metrics

    return train_step


def init_compression_train_state(key, cfg: CodecConfig, lr: float = 5e-4,
                                 pretrained=None, balance_weights=None):
    """State for the plain-codec trainer: generator optimizer tracks the
    (encoder, decoder) tree."""
    k1, k2 = jax.random.split(key)
    params = pretrained if pretrained is not None else wm.init_wmencodec(k1, cfg)
    frozen = dict(encoder=params["encoder"], decoder=params["decoder"],
                  quantizer=params["quantizer"])
    disc_params = disc_mod.init_msstftd(k2)
    g_opt_t, d_opt_t = make_optimizers(lr)
    trainable = dict(encoder=frozen["encoder"], decoder=frozen["decoder"])
    state = CodecTrainState(
        wm_params=params["wmdecoder"], frozen=frozen, disc_params=disc_params,
        g_opt=g_opt_t.init(trainable), d_opt=d_opt_t.init(disc_params),
        balancer=L.init_balancer(
            list(BALANCE_WEIGHTS if balance_weights is None
                 else balance_weights)),
        ema_params=jax.tree.map(jnp.copy, params["wmdecoder"]),
        step=jnp.zeros((), jnp.int32),
    )
    return state, (g_opt_t, d_opt_t)


def kmeans_init_codebooks(key, cfg: CodecConfig, embeddings: jnp.ndarray,
                          iters: int = 50) -> jnp.ndarray:
    """k-means codebook initialization from encoder embeddings
    (reference core_vq.py:53-75, kmeans_init=true, 50 iters). Residual
    stages are initialized on the successive residuals.
    embeddings: [N, D] -> codebooks [n_q, bins, D]."""
    n_q, bins, d = cfg.rvq.n_q, cfg.rvq.bins, cfg.rvq.dimension
    resid = embeddings.astype(jnp.float32)
    books = []
    for qi in range(n_q):
        key, sub = jax.random.split(key)
        idx = jax.random.choice(sub, resid.shape[0], (bins,), replace=False)
        means = resid[idx]
        for _ in range(iters):
            assign = q.nearest_code(means, resid)
            one_hot = jax.nn.one_hot(assign, bins, dtype=jnp.float32)
            counts = one_hot.sum(0)
            sums = one_hot.T @ resid
            new_means = sums / jnp.maximum(counts[:, None], 1.0)
            means = jnp.where(counts[:, None] > 0, new_means, means)
        books.append(means)
        resid = resid - means[q.nearest_code(means, resid)]
    return jnp.stack(books)


def reconstruct(state: CodecTrainState, cfg: CodecConfig,
                wav: jnp.ndarray) -> jnp.ndarray:
    """Watermark-decoder reconstruction of a batch (clean labels) — the
    generate-stage payload (reference solvers/base.py:478-487 runs a
    ``generate`` stage whose samples the SampleManager stores)."""
    emb = seanet.encode(state.frozen["encoder"], wav, cfg.seanet)
    latents, _ = q.rvq_quantize(state.frozen["quantizer"], emb)
    labels = jnp.zeros((wav.shape[0], latents.shape[1]), jnp.int32)
    y_pred, _ = seanet.wm_decode(state.wm_params, latents, labels, wav, cfg.seanet)
    return y_pred[:, : wav.shape[1]]


def evaluate_sisnr(state: CodecTrainState, cfg: CodecConfig,
                   wav: jnp.ndarray) -> jnp.ndarray:
    """Eval-stage SI-SNR of the watermark reconstruction
    (wmcompression.py:196-224)."""
    from ..utils.metrics import si_snr

    return jnp.mean(si_snr(reconstruct(state, cfg, wav), wav))
