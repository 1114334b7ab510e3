"""Continuous-batching server: slot-recycled serving must match per-prompt
single decodes exactly under greedy sampling, including across refills
(request N+1 reusing the cache row of a finished request N)."""

import jax
import numpy as np
import pytest

from ssr_speech_tpu.config import DecodeConfig, tiny_ssr_config
from ssr_speech_tpu.inference import decode, serve
from ssr_speech_tpu.models import ssr as ssr_model

CFG = tiny_ssr_config()


@pytest.fixture(scope="module")
def params():
    return ssr_model.init_ssr(jax.random.PRNGKey(0), CFG)


def _requests(n, seed=21):
    rng = np.random.default_rng(seed)
    ts = CFG.tokens
    geom = [(30, 20, [(8, 15)]), (24, 14, [(5, 12)]), (36, 25, [(20, 30)]),
            (28, 18, [(4, 9), (14, 20)]), (22, 12, [(6, 10)]),
            (32, 22, [(10, 16)])]
    reqs = []
    for T, sx, mask in geom[:n]:
        y = rng.integers(0, ts.audio_vocab_size, size=(CFG.n_codebooks, T))
        x = rng.integers(0, CFG.text_vocab_size - 1, size=(sx,))
        reqs.append((x, y, mask))
    return reqs


def _greedy_dec(aug_text):
    return DecodeConfig(top_k=1, top_p=1.0, stop_repetition=-1,
                        cfg_coef=1.5, cfg_stride=2, aug_text=aug_text,
                        cfg_pretrained=True, max_gen_per_span=120,
                        length_cap_mult=10)


@pytest.mark.parametrize("aug_text", [False, True])
def test_served_greedy_matches_single(params, aug_text):
    """6 requests through 2 slots: every result (incl. the 2-span edit and
    every refilled lane) equals the single-prompt decode bit-for-bit."""
    reqs = _requests(6)
    dec = _greedy_dec(aug_text)
    served = serve.serve_requests(params, CFG, dec, reqs,
                                  jax.random.PRNGKey(0), n_slots=2,
                                  dtype_name="float32")
    assert len(served) == 6 and all(r is not None for r in served)
    for (x, y, mask), (codes_s, marks_s, oi_s, nm_s) in zip(reqs, served):
        codes_1, marks_1, oi_1, nm_1 = decode.generate(
            params, CFG, dec, x, y, mask, jax.random.PRNGKey(0),
            dtype_name="float32")
        np.testing.assert_array_equal(codes_s, codes_1)
        np.testing.assert_array_equal(marks_s, marks_1)
        assert oi_s == oi_1 and nm_s == nm_1


def test_server_reuse_across_runs(params):
    """The same ContinuousBatcher instance serves a second wave of requests
    (compiled programs and state buffers reused)."""
    dec = _greedy_dec(True)
    reqs = _requests(4)
    server = serve.ContinuousBatcher(params, CFG, dec, 2, sx_pad=64,
                                     p_pad=128, num_task=2,
                                     dtype_name="float32")
    first = server.run(reqs[:2], jax.random.PRNGKey(0))
    second = server.run(reqs[2:], jax.random.PRNGKey(1))
    for (x, y, mask), (codes_s, marks_s, oi_s, nm_s) in zip(
            reqs, first + second):
        codes_1, marks_1, oi_1, nm_1 = decode.generate(
            params, CFG, dec, x, y, mask, jax.random.PRNGKey(0),
            dtype_name="float32")
        np.testing.assert_array_equal(codes_s, codes_1)
        assert oi_s == oi_1 and nm_s == nm_1


def test_online_serving_matches_single(params):
    """run_online with a tiny step budget (many budget-exit/readmit cycles)
    and staggered arrivals still produces bit-exact results."""
    dec = _greedy_dec(True)
    reqs = _requests(4)
    server = serve.ContinuousBatcher(params, CFG, dec, 2, sx_pad=64,
                                     p_pad=128, num_task=2,
                                     dtype_name="float32")
    results, done_at = server.run_online(
        reqs, [0.0, 0.0, 0.01, 0.01], jax.random.PRNGKey(0), chunk_steps=7)
    assert all(r is not None for r in results)
    assert all(t is not None and t >= 0 for t in done_at)
    for (x, y, mask), (codes_s, marks_s, oi_s, nm_s) in zip(reqs, results):
        codes_1, marks_1, oi_1, nm_1 = decode.generate(
            params, CFG, dec, x, y, mask, jax.random.PRNGKey(0),
            dtype_name="float32")
        np.testing.assert_array_equal(codes_s, codes_1)
        assert oi_s == oi_1 and nm_s == nm_1


def test_served_tp_sharded_matches_unsharded(params):
    """Continuous batching over TENSOR-PARALLEL-sharded params (megatron
    specs on an 8-device mesh): served greedy results stay bit-exact —
    the serve chunk, prefill and refill splice are all GSPMD-partitionable."""
    from ssr_speech_tpu.parallel import mesh as meshlib

    dec = _greedy_dec(True)
    reqs = _requests(4)
    base = serve.serve_requests(params, CFG, dec, reqs,
                                jax.random.PRNGKey(0), n_slots=2,
                                dtype_name="float32")
    mesh = meshlib.make_mesh(8, tp=2)
    params_sh = meshlib.shard_params_for_serving(mesh, params)
    sharded = serve.serve_requests(params_sh, CFG, dec, reqs,
                                   jax.random.PRNGKey(0), n_slots=2,
                                   dtype_name="float32")
    for (codes_b, marks_b, oi_b, nm_b), (codes_s, marks_s, oi_s, nm_s) in zip(
            base, sharded):
        np.testing.assert_array_equal(codes_s, codes_b)
        np.testing.assert_array_equal(marks_s, marks_b)
        assert oi_s == oi_b and nm_s == nm_b


def test_geometry_rejected(params):
    dec = _greedy_dec(False)
    server = serve.ContinuousBatcher(params, CFG, dec, 2, sx_pad=8,
                                     p_pad=32, num_task=1,
                                     dtype_name="float32")
    (x, y, mask) = _requests(1)[0]
    with pytest.raises(ValueError, match="exceeds server geometry"):
        server.run([(x, y, mask)])


def test_oversized_request_rejected_before_decoding(params):
    """A geometry violation anywhere in the workload fails BEFORE any
    decoding starts — a mid-run failure would abandon in-flight lanes and
    drop finished results — and the server stays usable afterwards."""
    dec = _greedy_dec(True)
    ok = _requests(2)
    big_x = np.arange(500) % 30  # exceeds sx_pad
    server = serve.ContinuousBatcher(params, CFG, dec, 2, sx_pad=64,
                                     p_pad=128, num_task=2,
                                     dtype_name="float32")
    with pytest.raises(ValueError, match="exceeds server geometry"):
        server.run(ok + [(big_x, ok[0][1], ok[0][2])])
    assert not np.asarray(server.state.active).any()  # nothing started
    results = server.run(ok, jax.random.PRNGKey(0))
    assert all(r is not None for r in results)


def test_eager_prefill_off_matches_on(params):
    """Eager prefill staging (prefill dispatched behind the in-flight chunk)
    must be a pure latency optimization: identical greedy results and fill
    order with eager_prefill=0 and =2, online and offline."""
    dec = _greedy_dec(False)
    reqs = _requests(6)

    def fresh():
        return serve.ContinuousBatcher(params, CFG, dec, 2, sx_pad=64,
                                       p_pad=128, num_task=2,
                                       dtype_name="float32")

    off = fresh().run(reqs, jax.random.PRNGKey(0), eager_prefill=0)
    on = fresh().run(reqs, jax.random.PRNGKey(0), eager_prefill=2)
    arrivals = [0.0, 0.0, 0.005, 0.005, 0.01, 0.01]
    off_o, _ = fresh().run_online(reqs, arrivals, jax.random.PRNGKey(0),
                                  chunk_steps=7, eager_prefill=0)
    on_o, _ = fresh().run_online(reqs, arrivals, jax.random.PRNGKey(0),
                                 chunk_steps=7, eager_prefill=2)
    for a, b in zip(off, on):
        np.testing.assert_array_equal(a[0], b[0])
        assert a[2] == b[2] and a[3] == b[3]
    for a, b in zip(off_o, on_o):
        np.testing.assert_array_equal(a[0], b[0])
        assert a[2] == b[2] and a[3] == b[3]
