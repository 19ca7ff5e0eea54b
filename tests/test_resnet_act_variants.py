"""Activation-optimized ResNet-50 variants (BASELINE config 4 extension)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnns_slfp_quantization_tpu import calib, models
from cnns_slfp_quantization_tpu.train import loop, optimizers


@pytest.mark.parametrize("act", ["stl", "swish"])
def test_act_variants_ship_their_own_calibration(act):
    """ReLU->STL/Swish changes every layer-input distribution, so the
    variants must NOT reuse the ReLU-calibrated resnet50_imgnet Ka
    (the reference's Swish variant likewise ships distinct constants,
    nets_cifar/mobilenetv1.py:180-186 vs :14-19)."""
    try:
        variant = calib.load_scales(f"resnet50_{act}_imgnet")
    except FileNotFoundError:
        pytest.skip("variant constants not generated yet "
                    "(tools/calibrate_act_variants.py)")
    relu = calib.load_scales("resnet50_imgnet")
    assert len(variant.ka) == len(relu.ka)
    # every post-activation conv input distribution changed; allow the stem
    # (raw image input, index 0) to coincide
    differing = np.sum(~np.isclose(variant.ka[1:], relu.ka[1:]))
    assert differing >= 0.9 * (len(relu.ka) - 1), (
        f"{differing} of {len(relu.ka) - 1} variant Ka differ — looks like "
        "the ReLU constants were reused")
    # and create_model wires the variant set in
    m = models.create_model(f"resnet_{act}", 8)
    np.testing.assert_array_equal(m.scales.ka, variant.ka)


@pytest.mark.parametrize("name,act", [("resnet_stl", "stl"),
                                      ("resnet_swish", "swish")])
def test_act_variant_forward_and_qat_step(name, act):
    m = models.create_model(name, 8)
    assert m.act == act and m.layerout_quant
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x, train=False)
    logits = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    assert logits.shape == (2, 1000)
    assert np.isfinite(np.asarray(logits, np.float32)).all()
    # differs from the ReLU model with identical params
    relu = models.create_model("resnet", 8)
    logits_relu = jax.jit(lambda v, x: relu.apply(v, x, train=False))(v, x)
    assert not np.allclose(np.asarray(logits, np.float32),
                           np.asarray(logits_relu, np.float32))
    # one DSGD QAT step trains (STL's custom gradient included)
    tx = optimizers.dsgd(1e-3, qbit=8)
    state = loop.TrainState.create(v, tx)
    step = loop.make_train_step(m, tx)
    s2, metrics = jax.jit(step)(state, x, jnp.zeros((2,), jnp.int32),
                                jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
