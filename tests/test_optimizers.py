"""DSGD/SSGD/SGD parity against the actual reference torch optimizers."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cnns_slfp_quantization_tpu.train import optimizers  # noqa: E402


@pytest.fixture(scope="module")
def ref_optim():
    import types

    if "torchvision" not in sys.modules:
        sys.modules["torchvision"] = types.ModuleType("torchvision")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    return importlib.import_module("utils.optimizer")


def _run_ours(tx, w0, grads_seq):
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    out = []
    for g in grads_seq:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}
        out.append(np.asarray(params["w"]))
    return out


def _run_torch(opt_cls, w0, grads_seq, **kw):
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = opt_cls([p], **kw)
    out = []
    for g in grads_seq:
        p.grad = torch.from_numpy(g.copy())
        opt.step()
        out.append(p.detach().numpy().copy())
    return out


@pytest.mark.parametrize("qbit", [8, 7])
def test_dsgd_matches_reference(ref_optim, qbit):
    rng = np.random.default_rng(0)
    w0 = rng.normal(0, 0.5, 4096).astype(np.float32)
    grads = [rng.normal(0, 0.1, 4096).astype(np.float32) for _ in range(4)]
    want = _run_torch(ref_optim.DSGD, w0, grads, qbit=qbit, lr=0.05,
                      momentum=0.9, weight_decay=5e-4)
    got = _run_ours(
        optimizers.dsgd(0.05, qbit, momentum=0.9, weight_decay=5e-4),
        w0, grads)
    for step, (a, b) in enumerate(zip(got, want)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7,
                                   err_msg=f"step {step}")


def test_ssgd_matches_reference(ref_optim):
    rng = np.random.default_rng(1)
    w0 = rng.normal(0, 0.5, 2048).astype(np.float32)
    grads = [rng.normal(0, 0.1, 2048).astype(np.float32) for _ in range(3)]
    want = _run_torch(ref_optim.SSGD, w0, grads, qbit=8, lr=0.01,
                      momentum=0.9, weight_decay=5e-4)
    got = _run_ours(
        optimizers.ssgd(0.01, 8, momentum=0.9, weight_decay=5e-4), w0, grads)
    for step, (a, b) in enumerate(zip(got, want)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7,
                                   err_msg=f"step {step}")


def test_sgd_matches_reference(ref_optim):
    rng = np.random.default_rng(2)
    w0 = rng.normal(0, 0.5, 1024).astype(np.float32)
    grads = [rng.normal(0, 0.1, 1024).astype(np.float32) for _ in range(3)]
    want = _run_torch(ref_optim.NormalSGD, w0, grads, lr=0.1, momentum=0.9,
                      weight_decay=5e-4)
    got = _run_ours(optimizers.sgd(0.1, momentum=0.9, weight_decay=5e-4),
                    w0, grads)
    for step, (a, b) in enumerate(zip(got, want)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7,
                                   err_msg=f"step {step}")


def test_dsgd_double_step_semantics():
    # A weight stuck inside a quantization bin gets exactly 3x the step.
    tx = optimizers.dsgd(1e-6, 8, momentum=0.0, weight_decay=0.0)
    params = {"w": jnp.asarray([1.0, 0.5])}
    state = tx.init(params)
    g = {"w": jnp.asarray([1.0, 1.0])}
    updates, _ = tx.update(g, state, params)
    # lr tiny -> quantized value unchanged -> scale 2 -> delta = -3*lr*g
    np.testing.assert_allclose(np.asarray(updates["w"]), [-3e-6, -3e-6],
                               rtol=1e-5)
