"""Activation-optimized ResNet-50 variants (BASELINE config 4 extension)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnns_slfp_quantization_tpu import models
from cnns_slfp_quantization_tpu.train import loop, optimizers


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
