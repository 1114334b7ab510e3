"""Eve optimizer parity vs the reference, and metrics writer round-trip."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssr_speech_tpu.training import optim as optimlib
from ssr_speech_tpu.utils.logging_utils import MetricsWriter


def test_eve_matches_reference():
    if not os.path.isdir("/root/reference"):
        pytest.skip("no reference")
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_optim2", "/root/reference/steps/optim.py")
    ref_optim = importlib.util.module_from_spec(spec)
    sys.modules["ref_optim2"] = ref_optim
    spec.loader.exec_module(ref_optim)

    torch.manual_seed(1)
    lin = torch.nn.Linear(6, 5)
    alpha = torch.nn.Parameter(torch.tensor([0.4]))
    opt = ref_optim.Eve([lin.weight, lin.bias, alpha], lr=1e-2,
                        betas=(0.9, 0.98), weight_decay=1e-3, target_rms=0.1)

    jparams = {
        "w": jnp.asarray(np.array(lin.weight.detach().numpy(), copy=True)),
        "b": jnp.asarray(np.array(lin.bias.detach().numpy(), copy=True)),
        "alpha": jnp.asarray(np.array(alpha.detach().numpy(), copy=True)),
    }
    jopt = optimlib.eve(lambda s: 1e-2, betas=(0.9, 0.98), weight_decay=1e-3)
    jstate = jopt.init(jparams)

    rng = np.random.default_rng(1)
    for step in range(8):
        gw = rng.normal(size=(5, 6)).astype(np.float32) * 0.1
        gb = rng.normal(size=(5,)).astype(np.float32) * 0.1
        ga = rng.normal(size=(1,)).astype(np.float32) * 0.1
        lin.weight.grad = torch.from_numpy(gw)
        lin.bias.grad = torch.from_numpy(gb)
        alpha.grad = torch.from_numpy(ga)
        opt.step()

        grads = {"w": jnp.asarray(gw), "b": jnp.asarray(gb),
                 "alpha": jnp.asarray(ga)}
        updates, jstate = jopt.update(grads, jstate, jparams)
        jparams = jax.tree.map(lambda p, u: p + u, jparams, updates)

        np.testing.assert_allclose(np.asarray(jparams["w"]),
                                   lin.weight.detach().numpy(),
                                   atol=1e-6, rtol=1e-5, err_msg=f"step {step}")
        np.testing.assert_allclose(np.asarray(jparams["alpha"]),
                                   alpha.detach().numpy(),
                                   atol=1e-6, rtol=1e-5)


@pytest.mark.slow
def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.add_scalars(1, dict(loss=0.5, acc=0.9), prefix="train/")
    w.add_scalars(2, dict(loss=0.4), prefix="train/")
    w.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["train/loss"] == 0.5
    assert rows[1]["step"] == 2
