"""icefall scaling toolbox parity: DoubleSwish, BasicNorm, ActivationBalancer
(forward AND gradient surgery) vs the reference autograd functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssr_speech_tpu.ops import scaling as sc

from .reference_loader import REFERENCE_ROOT, load_reference_lm

pytestmark = pytest.mark.skipif(
    not REFERENCE_ROOT.is_dir(), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_scaling():
    load_reference_lm()  # loads refssr.models.modules.scaling with stubs
    import sys

    return sys.modules["refssr.models.modules.scaling"]


def test_double_swish_forward(ref_scaling):
    import torch

    x = np.linspace(-6, 6, 101).astype(np.float32)
    want = ref_scaling.DoubleSwish()(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(sc.double_swish(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_double_swish_grad_exact():
    # our derivative is exact (the torch one is uint8-compressed on purpose):
    # d/dx x*s(x-1) = s + x*s*(1-s)
    x = jnp.linspace(-4.0, 4.0, 41)
    g = jax.vmap(jax.grad(lambda v: sc.double_swish(v)))(x)
    s = jax.nn.sigmoid(x - 1.0)
    want = s + x * s * (1 - s)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), atol=1e-6)


def test_basic_norm_forward(ref_scaling):
    import torch

    torch.manual_seed(0)
    bn = ref_scaling.BasicNorm(16, eps=0.25).eval()
    x = np.random.default_rng(0).normal(size=(3, 5, 16)).astype(np.float32)
    with torch.no_grad():
        want = bn(torch.from_numpy(x)).numpy()
    got = np.asarray(sc.basic_norm(jnp.asarray(x),
                                   jnp.asarray(bn.eps.detach().numpy())))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)
    # our init helper matches the reference module's learnable-eps init
    np.testing.assert_allclose(np.asarray(sc.init_basic_norm(0.25)),
                               bn.eps.detach().numpy(), atol=1e-7)


def test_scale_sign_factors_match(ref_scaling):
    import torch

    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 7, 16)).astype(np.float32) * 0.3
    xt = torch.from_numpy(x)
    want_scale = ref_scaling._compute_scale_factor(
        xt, -1, min_abs=0.2, max_abs=0.5, gain_factor=0.02,
        max_factor=0.04).numpy()
    got_scale = np.asarray(sc.compute_scale_factor(
        jnp.asarray(x), -1, min_abs=0.2, max_abs=0.5, gain_factor=0.02,
        max_factor=0.04))
    np.testing.assert_allclose(got_scale, want_scale, atol=1e-6)

    want_sign = ref_scaling._compute_sign_factor(
        xt, -1, min_positive=0.3, max_positive=0.7, gain_factor=0.01,
        max_factor=0.04).numpy()
    got_sign = np.asarray(sc.compute_sign_factor(
        jnp.asarray(x), -1, min_positive=0.3, max_positive=0.7,
        gain_factor=0.01, max_factor=0.04))
    np.testing.assert_allclose(got_sign, want_sign, atol=1e-6)


def test_activation_balancer_gradient_surgery(ref_scaling):
    """The custom-vjp backward must match ActivationBalancerFunction.apply
    exactly: identity forward, grad - |grad| * factor backward."""
    import torch

    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 6, 8)).astype(np.float32)
    cot = rng.normal(size=(3, 6, 8)).astype(np.float32)

    xt = torch.from_numpy(x).requires_grad_(True)
    scale_t = ref_scaling._compute_scale_factor(
        xt.detach(), 2, 0.2, 100.0, 0.02, 0.04)
    sign_t = ref_scaling._compute_sign_factor(
        xt.detach(), 2, 0.05, 0.95, 0.01, 0.04)
    y = ref_scaling.ActivationBalancerFunction.apply(xt, scale_t, sign_t, 2)
    y.backward(torch.from_numpy(cot))
    want_grad = xt.grad.numpy()

    def f(v):
        return sc.activation_balancer(v, channel_dim=-1)

    yj, vjp = jax.vjp(f, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yj), x)  # identity forward
    (got_grad,) = vjp(jnp.asarray(cot))
    np.testing.assert_allclose(np.asarray(got_grad), want_grad,
                               atol=1e-6, rtol=1e-5)


def test_balancer_deterministic_is_plain_identity():
    x = jnp.linspace(-1, 1, 24).reshape(2, 3, 4)
    g = jax.grad(lambda v: jnp.sum(
        sc.activation_balancer(v, deterministic=True) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * x))


def test_balanced_double_swish_matches_reference_forward(ref_scaling):
    import torch

    x = np.random.default_rng(3).normal(size=(2, 5, 8)).astype(np.float32)
    mod = ref_scaling.BalancedDoubleSwish(8).eval()
    with torch.no_grad():
        want = mod(torch.from_numpy(x)).numpy()
    got = np.asarray(sc.balanced_double_swish(jnp.asarray(x),
                                              deterministic=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_scaled_init():
    init = sc.scaled_init(lambda key: dict(w=jnp.ones((3, 3))), 0.25)
    out = init(None)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.25)


@pytest.mark.parametrize("act", ["double_swish", "balanced_double_swish"])
def test_ssr_model_with_icefall_activation(act):
    """The transformer runs end-to-end with the icefall activations wired
    through config: training forward + compiled greedy decode agree between
    runs, and the balancer is a pure identity at inference."""
    from ssr_speech_tpu.config import DecodeConfig, tiny_ssr_config
    from ssr_speech_tpu.inference import decode
    from ssr_speech_tpu.models import ssr as ssr_model

    cfg = tiny_ssr_config(activation=act)
    params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    batch = dict(
        x=rng.integers(0, cfg.text_vocab_size, size=(2, 10)).astype(np.int32),
        x_lens=np.full(2, 10, np.int32),
        y=rng.integers(0, cfg.tokens.audio_vocab_size,
                       size=(2, 20, cfg.n_codebooks)).astype(np.int32),
        y_lens=np.full(2, 20, np.int32),
    )
    out = ssr_model.ssr_forward(params, cfg, batch, deterministic=False,
                                rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(out["loss"]))

    x = rng.integers(0, cfg.text_vocab_size - 1, size=(12,))
    y = rng.integers(0, cfg.tokens.audio_vocab_size,
                     size=(cfg.n_codebooks, 18))
    dec = DecodeConfig(top_k=1, top_p=1.0, stop_repetition=-1,
                       max_gen_per_span=40)
    c1, m1, i1, _ = decode.generate(params, cfg, dec, x, y, [(6, 12)],
                                    jax.random.PRNGKey(2),
                                    dtype_name="float32")
    c2, m2, i2, _ = decode.generate(params, cfg, dec, x, y, [(6, 12)],
                                    jax.random.PRNGKey(9),  # greedy: key-free
                                    dtype_name="float32")
    np.testing.assert_array_equal(c1, c2)


def test_whitening_metric_matches_reference(ref_scaling):
    import torch

    rng = np.random.default_rng(7)
    x = rng.normal(size=(50, 16)).astype(np.float32)
    # make it deliberately non-white
    x[:, 0] *= 5.0
    for groups in (1, 2, 4):
        want = ref_scaling._whitening_metric(torch.from_numpy(x),
                                             groups).item()
        got = float(sc.whitening_metric(jnp.asarray(x), groups))
        np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("proportion", [0.1, 10.0])
def test_whiten_gradient_surgery(ref_scaling, proportion):
    """Whiten backward parity vs WhiteningPenaltyFunction: inactive
    passthrough when the metric is under the limit, penalty-added gradient
    when over (reference self-test _test_whiten, scaling.py:1280-1303)."""
    import torch

    rng = np.random.default_rng(11)
    x = rng.normal(size=(100, 32)).astype(np.float32)
    direction = rng.normal(size=(32,)).astype(np.float32)
    coeffs = rng.normal(size=(100, 1)).astype(np.float32)
    x = x + proportion * direction * coeffs
    cot = rng.normal(size=(100, 32)).astype(np.float32)

    xt = torch.from_numpy(x).requires_grad_(True)
    y = ref_scaling.WhiteningPenaltyFunction.apply(xt, 2, 5.0, 0.1)
    y.backward(torch.from_numpy(cot))
    want = xt.grad.numpy()

    yj, vjp = jax.vjp(lambda v: sc.whiten(v, 2, 5.0, 0.1), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yj), x)  # identity forward
    (got,) = vjp(jnp.asarray(cot))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)
    if proportion < 0.2:
        np.testing.assert_allclose(np.asarray(got), cot)  # inactive
    else:
        assert not np.allclose(np.asarray(got), cot)  # penalty applied


@pytest.mark.parametrize("proportion", [0.05, 10.0])
def test_max_eig_matches_reference(ref_scaling, proportion):
    """MaxEig forward state + backward parity vs the torch module with
    cur_prob=1 (reference self-test _test_max_eig, scaling.py:1255-1277)."""
    import torch

    num_channels = 24
    rng = np.random.default_rng(13)
    x = rng.normal(size=(80, num_channels)).astype(np.float32)
    direction = rng.normal(size=(num_channels,)).astype(np.float32)
    coeffs = rng.normal(size=(80, 1)).astype(np.float32)
    x = x + proportion * direction * coeffs
    cot = rng.normal(size=(80, num_channels)).astype(np.float32)

    m = ref_scaling.MaxEig(num_channels, channel_dim=1, max_var_per_eig=0.5,
                           scale=0.1)
    m.cur_prob = 1.0
    xt = torch.from_numpy(x).requires_grad_(True)
    y = m(xt)
    y.backward(torch.from_numpy(cot))
    want_grad = xt.grad.numpy()
    want_dir = m.max_eig_direction.numpy()

    dir0 = sc.init_max_eig_direction(num_channels)
    np.testing.assert_allclose(
        np.asarray(dir0),
        (np.arange(num_channels) / np.linalg.norm(
            np.arange(num_channels))).astype(np.float32), atol=1e-7)

    def f(v):
        out, _, _ = sc.max_eig(v, dir0, channel_dim=1, max_var_per_eig=0.5,
                               grad_scale=0.1)
        return out

    yj, vjp = jax.vjp(f, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yj), x)
    (got_grad,) = vjp(jnp.asarray(cot))
    _, new_dir, vp = sc.max_eig(jnp.asarray(x), dir0, channel_dim=1,
                                max_var_per_eig=0.5, grad_scale=0.1)
    np.testing.assert_allclose(np.asarray(new_dir), want_dir,
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_grad), want_grad,
                               atol=1e-5, rtol=1e-4)
    if proportion < 0.2:
        np.testing.assert_allclose(np.asarray(got_grad), cot)  # gate closed
        assert float(vp) < 0.5
    else:
        assert float(vp) >= 0.5
        assert not np.allclose(np.asarray(got_grad), cot)


def test_with_loss(ref_scaling):
    import torch

    rng = np.random.default_rng(17)
    x = rng.normal(size=(4, 5)).astype(np.float32)
    aux = rng.normal(size=(3,)).astype(np.float32)

    xt = torch.from_numpy(x).requires_grad_(True)
    at = torch.from_numpy(aux).requires_grad_(True)
    y = ref_scaling.with_loss(xt, at)
    y.sum().backward()
    got = jax.grad(lambda v, a: jnp.sum(sc.with_loss(v, a)),
                   argnums=(0, 1))(jnp.asarray(x), jnp.asarray(aux))
    np.testing.assert_allclose(np.asarray(got[0]), xt.grad.numpy())
    np.testing.assert_allclose(np.asarray(got[1]), at.grad.numpy())
