"""Fused Pallas kernel: SLFP act-quantize -> uint8 weight decode -> MXU
matmul -> scaled epilogue.

MEASURED ROLE (docs/DESIGN.md rounds 2-3): this kernel's production niche
is the **uint8-packed serving substrate** — weights live in HBM as real
SLFP<3,4> codes (4x less weight HBM/disk than bf16; the reference only
fakes quantization in fp32) and decode in VMEM.  For float/bf16 weights the
all-XLA fused executor is FASTER at every measured batch size (XLA's conv
pipelining beats this kernel's whole-K weight-stationary tiling inside the
full network — A/B tables in docs/DESIGN.md), so `use_pallas` defaults
route 1x1/dense layers here only for packed weights.

Mechanics: activations quantize on the fly in VMEM, the matmul runs in
bf16 on the MXU with f32 accumulation, and the ``*Ka*Kw`` rescale / bias /
activation run in the epilogue before the tile is written back.  Covers
dense layers and 1x1 convolutions; spatial convs keep the XLA path, which
is already MXU-tiled.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cnns_slfp_quantization_tpu.kernels.quantize import (
    _P_TABLE,
    _tree_select,
    slfp34_act_bits,
)
from cnns_slfp_quantization_tpu.ops.sfp import _act_bf16_bits


def slfp34_decode_bits(codes: jax.Array) -> jax.Array:
    """uint8 SLFP<3,4> codes -> exact float32 values (0 for the zero code)."""
    c = codes.astype(jnp.int32)
    code7 = c & 0x7F
    sign = (c & 0x80) << 24
    ml = code7 & 15
    e = (code7 >> 4) - 4
    bits = ((e + 127) << 23) | _tree_select(ml, _P_TABLE)
    bits = jnp.where(code7 == 0, 0, bits)
    return jax.lax.bitcast_convert_type(bits | sign, jnp.float32)


def _cdiv(a, b):
    return -(-a // b)


def _matmul_kernel(x_ref, w_ref, b_ref, o_ref, *, ka, kw, act, quantize_x,
                   nonneg):
    if quantize_x:
        # integer-domain fused scale+quantize direct to bf16 (ops/sfp.py)
        xq = _act_bf16_bits(x_ref[:], 1.0 / ka, 8, nonneg)
    else:
        xq = x_ref[:]
    if w_ref.dtype == jnp.uint8:
        wv = slfp34_decode_bits(w_ref[:])
    else:
        wv = w_ref[:]  # pre-quantized float values
    y = jnp.dot(xq.astype(jnp.bfloat16), wv.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    if b_ref is not None:
        y = y + b_ref[:] * np.float32(1.0 / (ka * kw))
    y = y * np.float32(ka * kw)
    if act is not None:
        y = act(y)
    o_ref[:] = y.astype(o_ref.dtype)


def fused_quant_matmul(
    x: jax.Array,
    w_codes: jax.Array,
    *,
    ka: float,
    kw: float,
    bias: Optional[jax.Array] = None,
    act: Optional[Callable] = None,
    quantize_x: bool = True,
    nonneg: bool = False,
    bm: int = 256,
    bn: Optional[int] = None,
    out_dtype=jnp.float32,
) -> jax.Array:
    """``act((Q_a(x/ka) @ decode(w_codes)) * ka * kw + bias)``.

    x: [M, K] float; w_codes: [K, N] uint8 SLFP<3,4> codes (or float values).

    Blocking: grid is (N-tiles, M-tiles) with the M axis innermost, so each
    weight column tile is DMA'd to VMEM once and stays resident while the
    activation rows stream past it (weight-stationary); ``bn`` defaults to
    the whole N when the weight tile fits the VMEM budget.
    """
    M, K = x.shape
    K2, N = w_codes.shape
    assert K == K2, (K, K2)
    bm = min(bm, max(8, M))
    if bn is None:
        w_bytes = 1 if w_codes.dtype == jnp.uint8 else 4
        budget = 6 * 1024 * 1024  # leave room for x/out double buffers
        bn = max(128, min(N, budget // max(1, K * w_bytes) // 128 * 128))
    bn = min(bn, max(128, N))
    Mp, Np = _cdiv(M, bm) * bm, _cdiv(N, bn) * bn
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    if Np != N:
        w_codes = jnp.pad(w_codes, ((0, 0), (0, Np - N)))
        if bias is not None:
            bias = jnp.pad(bias, (0, Np - N))
    if bias is not None:
        bias = bias.reshape(1, Np)  # TPU wants >=2-D vectors

    kernel = functools.partial(
        _matmul_kernel, ka=float(ka), kw=float(kw), act=act,
        quantize_x=quantize_x, nonneg=nonneg)
    in_specs = [
        pl.BlockSpec((bm, K), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x, w_codes]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, bn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM))
        args.append(bias)
    else:
        kernel = functools.partial(kernel_no_bias, kernel)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        grid=(Np // bn, Mp // bm),  # M innermost: weight-stationary
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * Np,
            bytes_accessed=Mp * K * 4 * (Np // bn) + K * Np + Mp * Np * 4,
            transcendentals=0,
        ),
    )(*args)
    return out[:M, :N]


def kernel_no_bias(inner, x_ref, w_ref, o_ref):
    inner(x_ref, w_ref, None, o_ref)


def _diff_matmul(ka, kw, out_dtype, nonneg=False):
    """Differentiable wrapper: Pallas forward, analytic STE backward.

    The forward (bitcasts + pallas_call) is not autodiff-able; the backward
    follows the reference semantics: y = (Q_a(x/ka) @ w_q [+ b/(ka*kw)]) *
    ka*kw with identity-STE through Q_a, so dy/dx = kw * (g @ w_q^T),
    dy/dw_q = ka * (Q_a(x/ka)^T @ g) * kw ... expressed with the bf16 cast
    the MXU uses.  Weight-quantization STE happens upstream (the caller
    passes w_q = Q_w(kernel/kw) built with its own custom_vjp).
    """

    @jax.custom_vjp
    def op(x, w_values, bias):
        return fused_quant_matmul(x, w_values, ka=ka, kw=kw, bias=bias,
                                  out_dtype=out_dtype, nonneg=nonneg)

    def fwd(x, w_values, bias):
        y = op(x, w_values, bias)
        return y, (x, w_values)

    def bwd(res, g):
        x, w_values = res
        gf = g.astype(jnp.float32)
        dx = (gf @ w_values.astype(jnp.float32).T) * np.float32(kw)
        xq = _act_bf16_bits(x, 1.0 / ka, 8, nonneg).astype(jnp.float32)
        dw = (xq.T @ gf) * np.float32(ka * kw)
        db = jnp.sum(gf, axis=0)  # bias enters as b/(ka*kw) * ka*kw = b
        return dx.astype(x.dtype), dw.astype(w_values.dtype), db

    op.defvjp(fwd, bwd)
    return op


def quant_dense(x, w_codes, *, ka, kw, bias=None, act=None, nonneg=False,
                **kw_args):
    """Dense layer on packed/pre-quantized weights; x: [..., K].

    Differentiable (STE backward) when weights are float values; uint8
    codes are inference-only.
    """
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if w_codes.dtype != jnp.uint8 and act is None:
        out_dtype = kw_args.get("out_dtype", jnp.float32)
        b = bias if bias is not None else jnp.zeros(
            (w_codes.shape[-1],), jnp.float32)
        y = _diff_matmul(float(ka), float(kw), out_dtype, nonneg)(
            x2, w_codes, b)
    else:
        y = fused_quant_matmul(x2, w_codes, ka=ka, kw=kw, bias=bias,
                               act=act, nonneg=nonneg, **kw_args)
    return y.reshape(*lead, y.shape[-1])


def quant_conv1x1(x_nhwc, w_codes, *, ka, kw, bias=None, act=None,
                  stride: int = 1, nonneg: bool = False, **kw_args):
    """1x1 convolution on packed/pre-quantized weights; w_codes: [Cin, Cout]."""
    if stride != 1:
        x_nhwc = x_nhwc[:, ::stride, ::stride, :]
    b, h, w, c = x_nhwc.shape
    y = quant_dense(x_nhwc.reshape(-1, c), w_codes, ka=ka, kw=kw, bias=bias,
                    act=act, nonneg=nonneg, **kw_args)
    return y.reshape(b, h, w, -1)
