"""Frozen (pre-quantized) weights must be bit-identical to the QAT path."""

import jax
import jax.numpy as jnp
import numpy as np

from cnns_slfp_quantization_tpu import models
from cnns_slfp_quantization_tpu.ops import freeze


def test_prequantized_forward_identical():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    m = models.create_model("mobilenet", 8)
    v = m.init(rng, x, train=False)
    want = np.asarray(m.apply(v, x, train=False))

    cap = models.create_model("mobilenet", 8, capture="full")
    v_frozen = freeze.prequantize_variables(cap, v, x[:1])
    m_frozen = models.create_model("mobilenet", 8, frozen_weights=True)
    got = np.asarray(m_frozen.apply(v_frozen, x, train=False))
    np.testing.assert_array_equal(got, want)
