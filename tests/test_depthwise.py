"""Pallas depthwise-3x3 kernel vs XLA's grouped conv (exactness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnns_slfp_quantization_tpu.kernels import depthwise
from cnns_slfp_quantization_tpu.ops import sfp


def _xla_dw(x, w, scale, shift, relu):
    # w [3,3,C] -> HWIO [3,3,1,C] grouped conv
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.reshape(3, 3, 1, -1).astype(jnp.float32),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])
    y = y * scale + shift
    return jnp.maximum(y, 0.0) if relu else y


@pytest.mark.parametrize("relu", [False, True])
def test_dw3x3_matches_xla(relu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 12, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.5, (3, 3, 128)).astype(np.float32))
    scale = jnp.asarray(rng.normal(1, 0.1, (128,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(0, 0.1, (128,)).astype(np.float32))
    want = np.asarray(jax.jit(lambda *a: _xla_dw(*a, relu))(
        x, w, scale, shift), np.float32)
    got = np.asarray(jax.jit(lambda x, w, s, t: depthwise.dw3x3(
        x, w, scale=s, shift=t, relu=relu, out_dtype=jnp.float32))(
        x, w, scale, shift), np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dw3x3_fused_quant_epilogue():
    """quant_out_recip must equal XLA-dw -> relu -> fused act quantize."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.5, (3, 3, 128)).astype(np.float32))
    recip = 1.0 / 1.7
    base = _xla_dw(x, w, jnp.ones((128,)), jnp.zeros((128,)), True)
    want = np.asarray(sfp._act_bf16_bits(base, recip, 8, True))
    got = np.asarray(jax.jit(lambda x, w: depthwise.dw3x3(
        x, w, relu=True, quant_out_recip=recip))(x, w))
    np.testing.assert_array_equal(got.view(np.uint16), want.view(np.uint16))
