"""Fused MobileNetV1 inference path vs the module path.

Scales are calibrated on the test input (the real deployment workflow —
reference ``--pre_reference``); with the shipped constants (tuned for the
*trained* reference weights) a random-init model saturates the quantizers
and bin-flip noise compounds over 27 sequential quantize stages.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnns_slfp_quantization_tpu import calib, models
from cnns_slfp_quantization_tpu.calib import calibrate as calibrate_lib
from cnns_slfp_quantization_tpu.models import mobilenetv1_fused
from cnns_slfp_quantization_tpu.ops import freeze


@pytest.mark.parametrize("net,size,quant_fc", [
    ("mobilenet", 32, True),
    ("mobilenetv1", 64, False),
])
def test_fused_apply_matches_module(net, size, quant_fc):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, size, size, 3), jnp.float32)

    # calibrate ka/kw for this random init on this input (fp32 absmax pass)
    fp32 = models.create_model(net, 32, capture="absmax")
    v32 = fp32.init(jax.random.PRNGKey(1), x[:1], train=False)
    res = calibrate_lib.calibrate(
        fp32, v32, [(np.asarray(x), np.zeros(len(x), np.int32))])
    scales = calib.ScaleSet(ka=np.asarray(res.ka_max()) / 15.5,
                            kw=np.asarray(res.kw_max()) / 15.5, divisor=15.5)

    m = models.create_model(net, 8, scales=scales)
    v = m.init(jax.random.PRNGKey(1), x[:1], train=False)
    cap = models.create_model(net, 8, scales=scales, capture="full")
    vf = freeze.prequantize_variables(cap, v, x[:1], dtype=jnp.bfloat16)
    mb = models.create_model(net, 8, scales=scales,
                             compute_dtype=jnp.bfloat16,
                             frozen_weights=True, use_pallas=False)
    want = np.asarray(jax.jit(
        lambda v, x: mb.apply(v, x, train=False))(vf, x), np.float32)

    got = np.asarray(jax.jit(
        lambda v, x: mobilenetv1_fused.fused_apply(
            v, x, scales=scales, quant_classifier=quant_fc))(vf, x),
        np.float32)
    assert got.shape == want.shape
    cos = float(np.sum(got * want) /
                (np.linalg.norm(got) * np.linalg.norm(want) + 1e-30))
    # 28 sequential quantize stages with no residual smoothing: random-init
    # logits are ~0.02 in magnitude, so lone bin flips visibly perturb the
    # direction; require high cosine plus top-1 agreement wherever the
    # module's top-2 margin exceeds the observed elementwise drift.
    assert cos > 0.98, f"{net}: cos={cos}"
    diff = np.abs(got - want).max()
    top2 = np.sort(want, axis=-1)[:, -2:]
    decisive = (top2[:, 1] - top2[:, 0]) > 3 * diff
    np.testing.assert_array_equal(np.argmax(got, -1)[decisive],
                                  np.argmax(want, -1)[decisive])
