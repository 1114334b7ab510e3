"""DAdaptAdam + cosine/inverse-sqrt/polynomial schedules vs the reference."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssr_speech_tpu.training.optim_extras import (
    cosine_schedule,
    dadapt_adam,
    inverse_sqrt_schedule,
    polynomial_decay_schedule,
)

from .reference_loader import REFERENCE_ROOT


def _ref_sched(name):
    import importlib.util
    import sys
    import types

    path = (REFERENCE_ROOT / "audiocraft" / "audiocraft" / "optim" /
            f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


needs_ref = pytest.mark.skipif(not REFERENCE_ROOT.is_dir(),
                               reason="reference tree not mounted")


@needs_ref
@pytest.mark.parametrize("step", [0, 10, 100, 500, 999, 1000, 1500])
def test_cosine_schedule_matches_reference(step):
    import torch

    mod = _ref_sched("cosine_lr_scheduler")
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.1)
    ref = mod.CosineLRScheduler(opt, total_steps=1000, warmup_steps=100,
                                lr_min_ratio=0.05, cycle_length=1.0)
    want = ref._get_sched_lr(0.1, step)
    got = float(cosine_schedule(0.1, 1000, 100, 0.05, 1.0)(step))
    assert got == pytest.approx(want, rel=1e-6)


@needs_ref
@pytest.mark.parametrize("step", [0, 5, 49, 50, 200, 1000])
def test_inverse_sqrt_schedule_matches_reference(step):
    import torch

    mod = _ref_sched("inverse_sqrt_lr_scheduler")
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.2)
    ref = mod.InverseSquareRootLRScheduler(opt, warmup_steps=50,
                                           warmup_init_lr=0.01)
    want = ref._get_sched_lr(0.2, step)
    got = float(inverse_sqrt_schedule(0.2, 50, 0.01)(step))
    if step == 0:
        assert got == pytest.approx(want, abs=1e-7)
    else:
        assert got == pytest.approx(want, rel=1e-5)


@needs_ref
@pytest.mark.parametrize("step", [0, 3, 10, 60, 500, 1000, 1200])
def test_polynomial_schedule_matches_reference(step):
    import torch

    mod = _ref_sched("polynomial_decay_lr_scheduler")
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.3)
    ref = mod.PolynomialDecayLRScheduler(opt, warmup_steps=50,
                                         total_steps=1000, end_lr=0.01,
                                         zero_lr_warmup_steps=5, power=2.0)
    want = ref._get_sched_lr(0.3, step)
    got = float(polynomial_decay_schedule(0.3, 1000, 50, 0.01, 5, 2.0)(step))
    assert got == pytest.approx(want, rel=1e-5, abs=1e-8)


@needs_ref
def test_dadapt_adam_matches_reference_steps():
    """Step-for-step parity of params AND the learned d against the torch
    DAdaptAdam on a small problem (dadam.py:107-252)."""
    import torch

    mod = _ref_sched("dadam")
    # the reference imports .fsdp for auto-detection; stub it out
    import sys
    import types

    fsdp_stub = types.ModuleType("fsdp")
    fsdp_stub.is_fsdp_used = lambda: False
    mod.is_fsdp_used = fsdp_stub.is_fsdp_used

    torch.manual_seed(0)
    shapes = [(5, 3), (7,), (2, 2, 2)]
    t_params = [torch.nn.Parameter(torch.randn(*s)) for s in shapes]
    init_np = [p.detach().numpy().copy() for p in t_params]

    class _DA(mod.DAdaptAdam):
        def __init__(self, params, **kw):
            # bypass the .fsdp import in the reference __init__
            import torch.optim

            torch.optim.Optimizer.__init__(self, params, dict(
                lr=kw.get("lr", 1.0), betas=kw.get("betas", (0.9, 0.999)),
                eps=kw.get("eps", 1e-8),
                weight_decay=kw.get("weight_decay", 0.0),
                d=kw.get("d0", 1e-6), k=0, gsq_weighted=0.0, log_every=0,
                decouple=True, growth_rate=kw.get("growth_rate",
                                                  float("inf")),
                fsdp_in_use=False))

    opt_t = _DA(t_params, lr=1.0, weight_decay=0.01)

    j_params = [jnp.asarray(a) for a in init_np]
    opt_j = dadapt_adam(lr=1.0, weight_decay=0.01)
    state = opt_j.init(j_params)

    rng = np.random.default_rng(1)
    for step in range(5):
        grads_np = [rng.normal(size=s).astype(np.float32) * (step + 1)
                    for s in shapes]
        for p, g in zip(t_params, grads_np):
            p.grad = torch.from_numpy(g.copy())
        opt_t.step()
        updates, state = opt_j.update(
            [jnp.asarray(g) for g in grads_np], state, j_params)
        j_params = jax.tree.map(lambda p, u: p + u, j_params, updates)
        d_ref = opt_t.param_groups[0]["d"]
        assert float(state.d) == pytest.approx(float(d_ref), rel=1e-5), step
        for jp, tp in zip(j_params, t_params):
            np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                                       rtol=2e-5, atol=1e-6)
