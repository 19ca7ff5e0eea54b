"""Frozen (pre-quantized) weights must be bit-identical to the QAT path."""

import jax
import jax.numpy as jnp


def _japply(m):
    return jax.jit(lambda v, x: m.apply(v, x, train=False))
import numpy as np

from cnns_slfp_quantization_tpu import models
from cnns_slfp_quantization_tpu.ops import freeze


def test_prequantized_forward_identical():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    m = models.create_model("mobilenet", 8)
    v = m.init(rng, x, train=False)
    want = np.asarray(_japply(m)(v, x))

    cap = models.create_model("mobilenet", 8, capture="full")
    v_frozen = freeze.prequantize_variables(cap, v, x[:1])
    m_frozen = models.create_model("mobilenet", 8, frozen_weights=True)
    got = np.asarray(_japply(m_frozen)(v_frozen, x))
    np.testing.assert_array_equal(got, want)


def test_packed_uint8_forward_close():
    # Real uint8 weight storage: decode-on-use must match the QAT forward
    # except for the clamp-literal codes (1.4e-7 relative).
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    m = models.create_model("mobilenet", 8)
    v = m.init(rng, x, train=False)
    want = np.asarray(_japply(m)(v, x))

    cap = models.create_model("mobilenet", 8, capture="full")
    v_packed = freeze.pack_variables(cap, v, x[:1])
    kernels = [p for p in jax.tree.leaves(v_packed["params"])
               if p.dtype == jnp.uint8]
    assert len(kernels) == 28  # every quant layer stored as codes
    m_frozen = models.create_model("mobilenet", 8, frozen_weights=True)
    got = np.asarray(_japply(m_frozen)(v_packed, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bf16_frozen_matches_runtime_cast():
    # Storing frozen weights in bf16 == casting f32 frozen weights at
    # runtime (the conv multiplies in bf16 either way).
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    m = models.create_model("mobilenet", 8)
    v = m.init(rng, x, train=False)
    cap = models.create_model("mobilenet", 8, capture="full")
    v_f32 = freeze.prequantize_variables(cap, v, x[:1])
    v_bf16 = freeze.prequantize_variables(cap, v, x[:1], dtype=jnp.bfloat16)
    mf = models.create_model("mobilenet", 8, frozen_weights=True,
                             compute_dtype=jnp.bfloat16, use_pallas=False)
    fa = _japply(mf)
    a = np.asarray(fa(v_f32, x), np.float32)
    b = np.asarray(fa(v_bf16, x), np.float32)
    np.testing.assert_array_equal(a, b)
