"""Cross-framework parity: run the actual reference PyTorch models (mounted
read-only at /root/reference) as the oracle and compare logits against our
TPU-native implementation after weight conversion.

This is the strongest parity evidence available without the pretrained
checkpoint zoo: same random weights, same input, logits must agree at fp32
and at SLFP8.  Skipped when /root/reference or torch is unavailable.
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


@pytest.fixture(scope="module")
def ref_modules():
    """Import reference model modules with their missing deps stubbed."""
    for stub in ("torchsummary", "tensorboardX", "torchsummaryX", "tqdm"):
        if stub not in sys.modules:
            mod = types.ModuleType(stub)
            mod.summary = lambda *a, **k: None
            sys.modules[stub] = mod
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    return {
        "mobilenetv1": importlib.import_module("nets_cifar.mobilenetv1"),
        "mobilenetv1_imgnet": importlib.import_module(
            "nets_imgnet.mobilenetv1"),
        "shufflenet": importlib.import_module("nets_cifar.shufflenet_v2"),
        "vgg16": importlib.import_module("nets_cifar.vgg16"),
        "resnet50": importlib.import_module("nets_imgnet.resnet50"),
        "alexnet": importlib.import_module("nets_imgnet.alexnet"),
        "squeezenet": importlib.import_module("nets_imgnet.squeezenet1_0"),
        "inception": importlib.import_module("nets_imgnet.inception_v3"),
    }


def _randomize_bn_stats(tmodel, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.2)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def _compare(tmodel, jmodel, x_nchw, *, qbit):
    tmodel.eval()
    if hasattr(tmodel, "reset_layer_inputs_outputs"):
        # Several reference models reference self.layer_inputs in forward()
        # without ever initializing it (e.g. shufflenet_v2.py:197); the
        # reference driver only survives because calibration calls reset_*
        # first.  Do the same.
        tmodel.reset_layer_inputs_outputs()
        tmodel.reset_layer_weights()
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x_nchw)).numpy()

    x_nhwc = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    # NB: must be the *raw* init dict — its insertion order is the module
    # call order that import_torch_state_dict matches positionally (a
    # jax-pytree round trip would sort keys alphabetically).
    variables = jmodel.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    variables = checkpoint.import_torch_state_dict(
        tmodel.state_dict(), variables)
    got = np.asarray(jax.jit(
        lambda v, x: jmodel.apply(v, x, train=False))(variables, x_nhwc))

    assert got.shape == want.shape
    if qbit == 32:
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2,
                                   err_msg=f"qbit={qbit}")
    else:
        # Quantized deep nets: XLA-vs-torch fp32 accumulation noise (~1e-7)
        # lands on quantization bin cliffs and diffuses (weights quantize
        # bit-identically; a ~0.005%-per-layer rate of one-bin input flips
        # compounds over depth).  Compare statistically over the batch:
        # per-sample logit direction and (nearly) all predictions agree —
        # at 32 samples one cliff-induced flip is tolerated, two are not.
        cos = np.sum(got * want, -1) / (
            np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
            + 1e-30)
        assert float(np.mean(cos)) > 0.995, \
            f"qbit={qbit}: mean logit cos={float(np.mean(cos)):.5f}"
        assert float(np.min(cos)) > 0.98, \
            f"qbit={qbit}: min logit cos={float(np.min(cos)):.5f}"
        mismatch = int(np.sum(np.argmax(got, -1) != np.argmax(want, -1)))
        assert mismatch <= max(1, got.shape[0] // 32), \
            f"qbit={qbit}: {mismatch}/{got.shape[0]} top-1 mismatches"


CASES = [
    # (ref builder, our name, input size, qbits)
    ("mobilenetv1", lambda m, q: m.MobileNetV1_Q(ch_in=3, qbit=q),
     "mobilenet", 32, [32, 8, 7]),
    ("mobilenetv1", lambda m, q: m.MobileNetV1_swish(ch_in=3, qbit=q),
     "mobilenet_swish", 32, [32, 8]),
    ("shufflenet", lambda m, q: m.ShuffleNetV2(qbit=q), "shufflenetv2", 32,
     [32, 8]),
    # width ratios (reference shufflenet_v2.py:120-127); registry plumbs
    # ``ratio`` through create_model
    ("shufflenet", lambda m, q: m.ShuffleNetV2(qbit=q, ratio=0.5),
     "shufflenetv2@0.5", 32, [32, 8]),
    ("shufflenet", lambda m, q: m.ShuffleNetV2(qbit=q, ratio=2),
     "shufflenetv2@2", 32, [32, 8]),
    # ImageNet MobileNetV1 (C10): unquantized final Linear, AvgPool2d(7) —
    # needs the full 224px input (nets_imgnet/mobilenetv1.py:58-61)
    ("mobilenetv1_imgnet", lambda m, q: m.MobileNetV1_Q(ch_in=3, qbit=q),
     "mobilenetv1", 224, [32, 8]),
    ("vgg16", lambda m, q: m.VGG16_Q(qbit=q), "vgg16", 32, [32, 8]),
    ("vgg16", lambda m, q: m.VGG16_gelu(qbit=q), "vgg16_gelu", 32, [32, 8]),
    ("resnet50", lambda m, q: m.ResNet50(qbit=q), "resnet", 64, [32, 8]),
    ("alexnet", lambda m, q: m.AlexNet(qbit=q), "alexnet", 224, [32, 8]),
    ("squeezenet", lambda m, q: m.SqueezeNet(qbit=q), "squeezenet", 224,
     [32, 8]),
    # FP32-only in the reference (import commented out in the driver,
    # imgnet_train_eval.py:21) — inventory parity, quantization N/A.
    ("inception", lambda m, q: m.inception_v3(num_classes=1000), "inceptionv3",
     96, [32]),
]


@pytest.mark.parametrize("case", CASES, ids=[c[2] for c in CASES])
def test_logit_parity(ref_modules, case):
    ref_name, builder, our_name, size, qbits = case
    kwargs = {}
    if "@" in our_name:
        our_name, ratio = our_name.split("@")
        kwargs["ratio"] = float(ratio)
    for qbit in qbits:
        torch.manual_seed(42)
        tmodel = builder(ref_modules[ref_name], qbit)
        with torch.no_grad():
            _randomize_bn_stats(tmodel)
        rng = np.random.default_rng(7)
        # 32 inputs per case (round-2/3 review: 2 random inputs is weak
        # statistical evidence); batched, so still one forward per framework.
        x = rng.normal(0, 1, (32, 3, size, size)).astype(np.float32)
        jmodel = models.create_model(our_name, qbit, **kwargs)
        _compare(tmodel, jmodel, x, qbit=qbit)
