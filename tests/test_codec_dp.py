"""Data-parallel codec GAN training over the device mesh.

The reference syncs the codec trainer with flashy/NCCL
(``solvers/wmcompression.py:162``, ``adversarial/losses.py:59``); here the
same step function runs SPMD: the wav/label batch is sharded over dp and XLA
inserts the gradient/metric collectives. One sharded step must match the
single-device step numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ssr_speech_tpu.config import CodecConfig, RVQConfig, SEANetConfig
from ssr_speech_tpu.models.codec import wmencodec as wm
from ssr_speech_tpu.parallel import mesh as meshlib
from ssr_speech_tpu.training import codec_trainer

TINY = CodecConfig(
    seanet=SEANetConfig(dimension=16, n_filters=2, n_residual_layers=1,
                        ratios=(8, 5, 4, 2), lstm=1, norm="weight_norm",
                        pad_mode="constant"),
    rvq=RVQConfig(dimension=16, n_q=2, bins=11),
)


@pytest.mark.slow
def test_codec_train_step_dp_sharded_matches_single():
    B, dur = 8, 0.4
    T = int(dur * TINY.sample_rate) // TINY.hop_length * TINY.hop_length
    frames = T // TINY.hop_length
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(B, T, 1)) * 0.1).astype(np.float32)
    labels, keep = wm.sample_watermark_mask(rng, B, frames, TINY.hop_length)

    def run(shard: bool):
        state, opts = codec_trainer.init_codec_train_state(
            jax.random.PRNGKey(0), TINY, lr=1e-3)
        step = codec_trainer.make_codec_train_step(TINY, opts, ema_decay=0.99)
        w, lab, kp = jnp.asarray(wav), jnp.asarray(labels), jnp.asarray(keep)
        if shard:
            mesh = meshlib.make_mesh(8, tp=1)
            put = lambda x: jax.device_put(
                x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1)))))
            w, lab, kp = put(w), put(lab), put(kp)
        new_state, metrics = step(state, w, lab, kp)
        return new_state, {k: float(v) for k, v in metrics.items()}

    s0, m0 = run(False)
    s1, m1 = run(True)
    for k in m0:
        assert m0[k] == pytest.approx(m1[k], rel=2e-3, abs=2e-5), k
    # f32 reduction order differs across the dp psum; allow tiny noise
    for a, b in zip(jax.tree.leaves(s0.wm_params),
                    jax.tree.leaves(s1.wm_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-4)
    for a, b in zip(jax.tree.leaves(s0.disc_params),
                    jax.tree.leaves(s1.disc_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-4)
