"""Fused quantize->matmul->epilogue Pallas kernel for 1x1 convs / dense.

This is the inference hot path behind ``models/resnet50_fused.py``: the
whole bottleneck chain runs as back-to-back kernels with no standalone
elementwise passes —

  prologue: SLFP<3,4> act quantize (``ops.sfp._act_bf16_bits``, the exact
            integer-domain quantizer) of the raw bf16 activation tile, or
            pass-through when the producer already emitted quantized values;
  matmul:   bf16 MXU dot, f32 accumulation (tile resident in VMEM);
  epilogue: per-channel scale/shift (Ka*Kw rescale with the folded BatchNorm
            affine), optional residual add, optional ReLU, and optionally the
            *next* layer's act quantize, so the consumer kernel (Pallas or
            XLA conv) reads ready-to-multiply values.

Measured honestly (TPU v5e, batch-256 ResNet-50, docs/DESIGN.md): inside the
full network this kernel LOSES to XLA's conv+epilogue fusion (5389 vs 9582
img/s with the same fused-executor structure) — the whole-K weight-stationary
tiling cannot match XLA's conv pipelining at these shapes.  It is kept as the
uint8-packed serving option (pass ``w`` as uint8 SLFP codes: 4x less weight
HBM, decoded in VMEM) and as the substrate for shapes where a fused prologue
does win; the throughput gains went into ``models/resnet50_fused.py``'s
BN-folding executor instead.

Reference semantics implemented: conv2d_func.py:20-25 (quantize/rescale),
resnet50.py:71-90 (bottleneck epilogue order: BN -> +identity -> ReLU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cnns_slfp_quantization_tpu.ops.sfp import _act_bf16_bits


def _cdiv(a, b):
    return -(-a // b)


def _pick_bm(M: int, K: int, N: int) -> int:
    """Row-block size: keep x/xq tiles + f32 temporaries inside VMEM.

    Tuned on TPU v5e (docs/DESIGN.md A/B table): larger tiles amortize
    per-iteration overhead until the f32 elementwise temporaries crowd VMEM.
    """
    if K <= 256:
        bm = 2048
    elif K <= 512:
        bm = 1024
    elif K <= 1024:
        bm = 512
    else:
        bm = 256
    return max(8, min(bm, _cdiv(M, 8) * 8))


def _kernel(x_ref, w_ref, s_ref, t_ref, *rest, quant_in, nonneg_in, relu,
            quant_out, recip_in, recip_out, have_residual):
    if have_residual:
        r_ref, o_ref = rest
    else:
        (o_ref,) = rest
    if quant_in:
        xq = _act_bf16_bits(x_ref[:], recip_in, 8, nonneg_in)
    else:
        xq = x_ref[:].astype(jnp.bfloat16)
    if w_ref.dtype == jnp.uint8:
        from cnns_slfp_quantization_tpu.kernels.fused_matmul import (
            slfp34_decode_bits)

        w = slfp34_decode_bits(w_ref[:]).astype(jnp.bfloat16)
    else:
        w = w_ref[:]
    y = jnp.dot(xq, w, preferred_element_type=jnp.float32)
    y = y * s_ref[:] + t_ref[:]
    if have_residual:
        y = y + r_ref[:].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    if quant_out:
        # post-ReLU outputs are provably nonneg; otherwise keep sign handling
        o_ref[:] = _act_bf16_bits(y, recip_out, 8, relu).astype(o_ref.dtype)
    else:
        o_ref[:] = y.astype(o_ref.dtype)


def qmm_fused(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    *,
    residual: Optional[jax.Array] = None,
    relu: bool = False,
    quant_in_recip: Optional[float] = None,
    nonneg_in: bool = True,
    quant_out_recip: Optional[float] = None,
    out_dtype=jnp.bfloat16,
    bm: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``epilogue(Q_a(x * quant_in_recip) @ w)`` as one Pallas kernel.

    x: [M, K] bf16/f32 activations (raw if ``quant_in_recip`` is set, else
       already SLFP-quantized values).
    w: [K, N] quantized weight *values* (bf16).
    scale/shift: [N] f32 fused output affine — ``Ka*Kw`` and the folded
       BatchNorm, applied as ``y*scale + shift``.
    residual: [M, N] optional skip tensor added before ReLU.
    quant_out_recip: emit ``Q_a(y * recip)`` (the consumer's 1/Ka) instead of
       raw y.
    """
    M, K = x.shape
    K2, N = w.shape
    assert K == K2, (K, K2)
    if bm is None:
        bm = _pick_bm(M, K, N)
    Mp = _cdiv(M, bm) * bm
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, Mp - M), (0, 0)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kern = functools.partial(
        _kernel,
        quant_in=quant_in_recip is not None,
        nonneg_in=nonneg_in,
        relu=relu,
        quant_out=quant_out_recip is not None,
        recip_in=float(quant_in_recip or 1.0),
        recip_out=float(quant_out_recip or 1.0),
        have_residual=residual is not None,
    )
    in_specs = [
        pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, w if w.dtype == jnp.uint8 else w.astype(jnp.bfloat16),
            scale.reshape(1, N).astype(jnp.float32),
            shift.reshape(1, N).astype(jnp.float32)]
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((bm, N), lambda i: (i, 0), memory_space=pltpu.VMEM))
        args.append(residual)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        grid=(Mp // bm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=(Mp * K * x.dtype.itemsize
                            + K * N * (1 if w.dtype == jnp.uint8 else 2)
                            + (Mp * N * residual.dtype.itemsize
                               if residual is not None else 0)
                            + Mp * N * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:M] if Mp != M else out


def quantize_act_pass(x: jax.Array, recip: float, *, nonneg: bool = True,
                      qbit: int = 8) -> jax.Array:
    """Standalone fused scale+quantize+bf16 pass (XLA elementwise).

    Used where one quantized tensor feeds several consumers (e.g. a
    bottleneck's conv1 and its downsample conv share Ka — verified equal in
    the reference's calibration constants for all four stage boundaries).
    """
    return _act_bf16_bits(x, recip, qbit, nonneg)
