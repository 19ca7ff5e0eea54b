"""Unit tests for the fused qmm Pallas kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from cnns_slfp_quantization_tpu.kernels import qmm
from cnns_slfp_quantization_tpu.ops import sfp


def _mk(m=48, k=128, n=256, seed=0):
    r1, r2 = jax.random.split(jax.random.PRNGKey(seed))
    x = jnp.abs(jax.random.normal(r1, (m, k), jnp.float32)) * 4
    w = sfp.quantize_weight(jax.random.normal(r2, (k, n), jnp.float32), 8)
    scale = jnp.linspace(0.5, 2.0, n, dtype=jnp.float32)
    shift = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)
    return x, w, scale, shift


def test_qmm_fused_matches_reference_math():
    x, w, scale, shift = _mk()
    got = qmm.qmm_fused(x, w, scale, shift, relu=True,
                        quant_in_recip=0.25, interpret=True)
    xq = sfp._act_bf16_bits(x, 0.25, 8, True)
    want = jnp.maximum(
        jnp.dot(xq, w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) * scale + shift, 0.0)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want.astype(jnp.bfloat16), np.float32))


def test_qmm_fused_uint8_packed_weights():
    x, w, scale, shift = _mk(seed=1)
    codes = sfp.pack_slfp34(w)
    got_f = qmm.qmm_fused(x, w, scale, shift, quant_in_recip=0.5,
                          interpret=True)
    got_u8 = qmm.qmm_fused(x, codes, scale, shift, quant_in_recip=0.5,
                           interpret=True)
    # decode(pack(w)) == w except the 15.32165 clamp literal (top code decodes
    # to the exact 15.3216522) — absent here since quantize_weight emits it
    # only at the clamp, and random normals stay below it.
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(got_u8))


def test_qmm_fused_residual_and_quant_out():
    x, w, scale, shift = _mk(m=33, seed=2)  # non-multiple of block: pad path
    res = jax.random.normal(jax.random.PRNGKey(3), (33, 256), jnp.float32)
    got = qmm.qmm_fused(x, w, scale, shift, residual=res, relu=True,
                        quant_in_recip=1.0, quant_out_recip=0.125,
                        interpret=True, bm=16)
    xq = sfp._act_bf16_bits(x, 1.0, 8, True)
    y = jnp.dot(xq, w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) * scale + shift
    y = jnp.maximum(y + res, 0.0)
    want = sfp._act_bf16_bits(y, 0.125, 8, True)
    assert got.shape == (33, 256)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_qmm_fused_signed_quant_out_without_relu():
    # relu=False + quant_out: negatives must quantize signed, not flush to 0
    x, w, scale, shift = _mk(seed=4)
    shift = shift - 5.0  # force negative outputs
    got = qmm.qmm_fused(x, w, scale, shift, relu=False,
                        quant_in_recip=1.0, quant_out_recip=0.125,
                        interpret=True)
    xq = sfp._act_bf16_bits(x, 1.0, 8, True)
    y = jnp.dot(xq, w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) * scale + shift
    want = sfp._act_bf16_bits(y, 0.125, 8, False)
    assert float(jnp.min(got)) < 0
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))
