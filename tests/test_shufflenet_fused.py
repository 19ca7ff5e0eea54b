"""Fused ShuffleNetV2 inference path vs the module path.

Same discipline as tests/test_mobilenet_fused.py: scales calibrated on the
test input (the --pre_reference workflow), pre-quantized frozen weights,
fused executor compared against the bf16 frozen module path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnns_slfp_quantization_tpu import calib, models
from cnns_slfp_quantization_tpu.calib import calibrate as calibrate_lib
from cnns_slfp_quantization_tpu.models import shufflenetv2_fused
from cnns_slfp_quantization_tpu.ops import freeze


def _calibrated_scales(net, x, ratio):
    fp32 = models.create_model(net, 32, capture="absmax", ratio=ratio)
    v32 = fp32.init(jax.random.PRNGKey(1), x[:1], train=False)
    res = calibrate_lib.calibrate(
        fp32, v32, [(np.asarray(x), np.zeros(len(x), np.int32))])
    # divisor 15.0, the ShuffleNetV2 convention (shufflenet_v2.py:141,:144)
    return calib.ScaleSet(ka=np.asarray(res.ka_max()) / 15.0,
                          kw=np.asarray(res.kw_max()) / 15.0, divisor=15.0)


@pytest.mark.parametrize("ratio", [1, 0.5])
def test_fused_apply_matches_module(ratio):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 32, 32, 3), jnp.float32)
    scales = _calibrated_scales("shufflenetv2", x, ratio)

    m = models.create_model("shufflenetv2", 8, scales=scales, ratio=ratio)
    v = m.init(jax.random.PRNGKey(1), x[:1], train=False)
    cap = models.create_model("shufflenetv2", 8, scales=scales,
                              capture="full", ratio=ratio)
    vf = freeze.prequantize_variables(cap, v, x[:1], dtype=jnp.bfloat16)
    mb = models.create_model("shufflenetv2", 8, scales=scales, ratio=ratio,
                             compute_dtype=jnp.bfloat16,
                             frozen_weights=True, use_pallas=False)
    want = np.asarray(jax.jit(
        lambda v, x: mb.apply(v, x, train=False))(vf, x), np.float32)

    got = np.asarray(jax.jit(
        lambda v, x: shufflenetv2_fused.fused_apply(
            v, x, scales=scales, ratio=ratio))(vf, x), np.float32)
    assert got.shape == want.shape == (8, 100)
    cos = float(np.sum(got * want) /
                (np.linalg.norm(got) * np.linalg.norm(want) + 1e-30))
    assert cos > 0.98, f"ratio={ratio}: cos={cos}"
    diff = np.abs(got - want).max()
    top2 = np.sort(want, axis=-1)[:, -2:]
    decisive = (top2[:, 1] - top2[:, 0]) > 3 * diff
    np.testing.assert_array_equal(np.argmax(got, -1)[decisive],
                                  np.argmax(want, -1)[decisive])


def test_fused_apply_packed_uint8():
    """uint8-packed weights decode in-graph and classify identically."""
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (4, 32, 32, 3), jnp.float32)
    scales = _calibrated_scales("shufflenetv2", x, 1)

    m = models.create_model("shufflenetv2", 8, scales=scales)
    v = m.init(jax.random.PRNGKey(1), x[:1], train=False)
    cap = models.create_model("shufflenetv2", 8, scales=scales,
                              capture="full")
    vf = freeze.prequantize_variables(cap, v, x[:1], dtype=jnp.bfloat16)
    vp = freeze.pack_variables(cap, v, x[:1])
    kinds = {a.dtype.name for a in jax.tree.leaves(vp["params"])}
    assert "uint8" in kinds
    f = jax.jit(lambda v, x: shufflenetv2_fused.fused_apply(
        v, x, scales=scales))
    a = np.asarray(f(vf, x), np.float32)
    b = np.asarray(f(vp, x), np.float32)
    # decode(pack(Q(w))) == Q(w) except the pseudo-zero (decodes to 0.0):
    # predictions must agree
    np.testing.assert_array_equal(np.argmax(a, -1), np.argmax(b, -1))
