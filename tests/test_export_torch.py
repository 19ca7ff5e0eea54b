"""jax -> torch weight export (checkpoint.export_torch_state_dict).

The export path enables the statistical PTQ-accuracy harness
(cli/ptq_accuracy.py): train in this framework, evaluate identical weights
in the reference torch oracle.  Round-trip and oracle-equivalence tests.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted")
torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cnns_slfp_quantization_tpu import models  # noqa: E402
from cnns_slfp_quantization_tpu.train import checkpoint  # noqa: E402


def _ref_module(name):
    for stub in ("torchsummary", "tensorboardX", "torchsummaryX", "tqdm"):
        if stub not in sys.modules:
            mod = types.ModuleType(stub)
            mod.summary = lambda *a, **k: None
            sys.modules[stub] = mod
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    return importlib.import_module(name)


def test_export_import_round_trip():
    """export(variables) -> import() reproduces the original tree exactly."""
    model = models.create_model("mobilenet", 32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x, train=False)

    mod = _ref_module("nets_cifar.mobilenetv1")
    template = mod.MobileNetV1_Q(ch_in=3, qbit=32).state_dict()
    sd = checkpoint.export_torch_state_dict(variables, template)
    back = checkpoint.import_torch_state_dict(sd, variables)

    flat_a = jax.tree.leaves(variables)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exported_weights_match_oracle_logits():
    """Our random-init weights, exported to the reference torch model,
    produce the same logits there as here (reverse direction of
    test_torch_parity; reference nets_cifar/mobilenetv1.py:10)."""
    model = models.create_model("mobilenet", 32)
    rng = np.random.default_rng(11)
    x_nhwc = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(5), jnp.asarray(x_nhwc),
                           train=False)
    ours = np.asarray(model.apply(variables, jnp.asarray(x_nhwc),
                                  train=False))

    mod = _ref_module("nets_cifar.mobilenetv1")
    tmodel = mod.MobileNetV1_Q(ch_in=3, qbit=32)
    sd = checkpoint.export_torch_state_dict(variables, tmodel.state_dict())
    tmodel.load_state_dict({k: torch.from_numpy(np.asarray(v))
                            for k, v in sd.items()})
    tmodel.eval()
    tmodel.reset_layer_inputs_outputs()
    tmodel.reset_layer_weights()
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            np.transpose(x_nhwc, (0, 3, 1, 2)).copy())).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-2)


@pytest.mark.slow
def test_ptq_flip_rate_parity_mobilenet():
    """Reduced statistical PTQ parity run (cli/ptq_accuracy.py): after
    training, SLFP8 PTQ must flip top-1 decisions at the same rate in both
    frameworks (within binomial noise) and quantized predictions must agree.
    """
    from cnns_slfp_quantization_tpu.cli import ptq_accuracy

    # signal=0.7 pins the pre-tuning easy task: this reduced 60-step run
    # gates the MECHANISM (export, calibration, flip statistics); the tuned
    # harder TASK signals (cli/ptq_accuracy.TASK) need the full 300 steps
    # and are exercised by the committed docs/ACCURACY.md runs
    r = ptq_accuracy.run_net(
        "mobilenet", train_steps=60, batch_size=64, eval_images=2000,
        eval_batch=64, lr=0.05, seed=0, signal=0.7)
    # the model must actually have learned (chance = 1%)
    assert r["acc_fp32_ours"] > 8.0, r
    # frameworks agree at fp32 (same weights, same math)
    assert r["pred_match_fp32"] > 0.98, r
    # PTQ flips decisions at statistically indistinguishable rates: 2·se at
    # the harness sample size, no absolute floor (round-3 review: the old
    # max(3·se, 0.02) gate passed trivially at 512 images)
    assert abs(r["flip_diff"]) <= 2 * r["flip_diff_se"], r
    # and the PTQ-induced accuracy delta agrees between frameworks
    assert abs(r["ptq_drop_ours"] - r["ptq_drop_torch"]) < 2.0, r
    # quantized decisions mostly coincide (60-step model: many near-ties)
    assert r["pred_match_slfp8"] > 0.9, r
    assert r["logit_cos_slfp8_mean"] > 0.98, r
