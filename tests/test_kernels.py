"""Pallas kernel parity tests (interpret mode on the CPU backend).

Per SURVEY.md §4c: per-layer parity of the fused Pallas kernels vs the
pure-jnp reference implementations in ops.sfp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from cnns_slfp_quantization_tpu.kernels import fused_matmul, quantize
from cnns_slfp_quantization_tpu.ops import sfp


def _rand(n=100_000, seed=0):
    rng = np.random.default_rng(seed)
    mag = np.exp(rng.uniform(np.log(1e-4), np.log(300.0), n)).astype(np.float32)
    return mag * rng.choice([-1.0, 1.0], n).astype(np.float32)


def test_act_bits_matches_reference_impl():
    x = jnp.asarray(np.concatenate([
        _rand(), np.asarray([0.0, -0.0, 0.0625, 0.125, 15.0, 15.32165,
                             -15.33, 1e-11], np.float32)]))
    got = np.asarray(quantize.slfp34_act_bits(x))
    want = np.asarray(sfp.quantize_act(x, 8))
    np.testing.assert_array_equal(got, want)


def test_pack_bits_matches_reference_impl():
    x = jnp.asarray(_rand(50_000))
    got = np.asarray(quantize.slfp34_pack_bits(x))
    want = np.asarray(sfp.pack_slfp34(sfp.quantize_act(x, 8)))
    np.testing.assert_array_equal(got, want)


def test_decode_bits_matches_unpack():
    codes = jnp.arange(256, dtype=jnp.uint8)
    got = np.asarray(fused_matmul.slfp34_decode_bits(codes))
    want = np.asarray(sfp.unpack_slfp34(codes))
    np.testing.assert_array_equal(got, want)


def test_pallas_quantize_kernel_interpret():
    x = jnp.asarray(_rand(40_000)).reshape(50, 800)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(quantize.slfp34_act_quantize(x, block_rows=8))
    want = np.asarray(sfp.quantize_act(x, 8))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("use_bias", [False, True])
def test_fused_quant_matmul_interpret(use_bias):
    rng = np.random.default_rng(3)
    M, K, N = 96, 160, 192
    ka, kw = 0.37, 0.11
    x = jnp.asarray(rng.normal(0, 1.5, (M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.05, (K, N)).astype(np.float32))
    wq = sfp.quantize_weight(w / kw, 8)
    codes = sfp.pack_slfp34(wq)
    bias = jnp.asarray(rng.normal(0, 0.1, (N,)).astype(np.float32)) if use_bias else None

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_matmul.fused_quant_matmul(
            x, codes, ka=ka, kw=kw, bias=bias, act=jax.nn.relu,
            bm=64, bn=128))

    xq = sfp.quantize_act(x / ka, 8).astype(jnp.bfloat16)
    wv = sfp.unpack_slfp34(codes).astype(jnp.bfloat16)
    want = jnp.dot(xq, wv, preferred_element_type=jnp.float32)
    if use_bias:
        want = want + bias / (ka * kw)
    want = jax.nn.relu(want * (ka * kw))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


def test_conv1x1_wrapper_interpret():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.05, (64, 96)).astype(np.float32))
    kw = 0.05
    codes = sfp.pack_slfp34(sfp.quantize_weight(w / kw, 8))
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(fused_matmul.quant_conv1x1(
            x, codes, ka=0.5, kw=kw, bm=64, bn=128))
    assert y.shape == (2, 8, 8, 96)
    xq = sfp.quantize_act(x / 0.5, 8).astype(jnp.bfloat16)
    wv = sfp.unpack_slfp34(codes).astype(jnp.bfloat16)
    want = jnp.einsum("bhwc,cd->bhwd", xq, wv,
                      preferred_element_type=jnp.float32) * (0.5 * kw)
    np.testing.assert_allclose(y, np.asarray(want), rtol=1e-4, atol=1e-4)


def test_fused_dense_custom_vjp_ste():
    # Differentiable fused path: gradients must follow the reference STE
    # semantics (d/dx of Q_a(x/ka)@wq*ka*kw = kw * wq^T under identity STE).
    rng = np.random.default_rng(9)
    M, K, N = 32, 64, 48
    ka, kw = 0.5, 0.1
    x = jnp.asarray(rng.normal(0, 1, (M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.05, (K, N)).astype(np.float32))
    wq = sfp.quantize_weight(w / kw, 8)
    bias = jnp.asarray(rng.normal(0, 0.1, (N,)).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        def f(x, wq, b):
            return jnp.sum(fused_matmul.quant_dense(
                x, wq, ka=ka, kw=kw, bias=b) ** 2)

        y, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(x, wq, bias)
        out = fused_matmul.quant_dense(x, wq, ka=ka, kw=kw, bias=bias)
    g = 2 * out  # d(sum y^2)/dy
    want_dx = np.asarray((g.astype(jnp.float32) @ wq.T) * kw)
    # dw uses the bf16-rounded xq — the same values the forward's MXU dot
    # actually consumed (fused_matmul._diff_matmul.bwd)
    xq = sfp.quantize_act(x / ka, 8).astype(jnp.bfloat16).astype(jnp.float32)
    want_dw = np.asarray((xq.T @ g.astype(jnp.float32)) * (ka * kw))
    want_db = np.asarray(jnp.sum(g, axis=0))
    np.testing.assert_allclose(np.asarray(grads[0]), want_dx, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads[1]), want_dw, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads[2]), want_db, rtol=1e-4, atol=1e-4)


def test_dual_epilogue_matches_consumer_path():
    """kernels/epilogue.dual_epilogue (one-pass raw + quantized block
    boundary) is bit-identical to the production consumer path:
    raw = bf16(relu(y*s + t + id)), q = quantize_act_pass(raw, recip)."""
    from cnns_slfp_quantization_tpu.kernels import epilogue, qmm

    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(0, 2, (4, 3, 5, 256)).astype(np.float32))
    ident = jnp.asarray(rng.normal(0, 1, (4, 3, 5, 256)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    s = jnp.asarray(rng.uniform(0.5, 1.5, (256,)).astype(np.float32))
    t = jnp.asarray(rng.normal(0, 0.2, (256,)).astype(np.float32))
    recip = 1.0 / 3.7

    raw_want = jnp.maximum(
        y * s + t + ident.astype(jnp.float32), 0.0).astype(jnp.bfloat16)
    q_want = qmm.quantize_act_pass(raw_want, recip)
    raw, q = epilogue.dual_epilogue(y, ident, s, t, recip, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(raw, np.float32), np.asarray(raw_want, np.float32))
    np.testing.assert_array_equal(
        np.asarray(q, np.float32), np.asarray(q_want, np.float32))
