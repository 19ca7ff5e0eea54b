"""Pallas VPU kernel for stride-1 depthwise 3x3 conv (MobileNet fast path).

Depthwise conv doesn't map to the MXU (no channel contraction: half of
MobileNetV1's layers, reference nets_cifar/mobilenetv1.py:47-64, run at
~1/128 MXU utilization as grouped convs).  It is a *bandwidth*-bound stencil:
speed-of-light is one HBM read of x plus one write of y.  This kernel
streams bh-row blocks through VMEM (Pallas double-buffers the block DMAs)
and computes the 9 shifted FMAs on the VPU, with the BN affine, ReLU, and
the *next* layer's SLFP act-quantize fused into the epilogue — the whole
dw3x3 -> BN -> ReLU -> Q_a chain in one pass over HBM.

Row overlap (the 2-row halo a 3x3 stencil needs) is expressed with two
block-indexed input views of the same padded array: a [bh]-row main block
plus a [2]-row halo block starting where the main block ends (bh even makes
the halo offset representable in 2-row block units).  The kernel
concatenates them in VMEM — a bh+2-row window per block, no overlapping
BlockSpecs needed.

A/B'd against XLA's native depthwise conv via tools/bench_depthwise.py;
wired into the fused MobileNet executor only where measured faster.

Layout: NHWC with C on the lane dimension (channels are vector lanes — each
lane runs an independent stencil).
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


def _dw_kernel(xm_ref, xh_ref, w_ref, s_ref, t_ref, o_ref, *, bh, W, relu,
               quant, recip_out, nonneg_in):
    # xm_ref: [1, bh, W+2, C] main rows; xh_ref: [1, 2, W+2, C] halo rows
    # o_ref: [1, bh, W, C]
    win = jnp.concatenate([xm_ref[0], xh_ref[0]], axis=0)  # [bh+2, W+2, C]
    acc = jnp.zeros(o_ref.shape[1:], jnp.float32)
    for i in range(3):
        for j in range(3):
            tile = win[i:i + bh, j:j + W, :].astype(jnp.float32)
            acc += tile * w_ref[i, j, :].astype(jnp.float32)
    y = acc * s_ref[0] + t_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    if quant:
        y = _act_bf16_bits(y, recip_out, 8, relu or nonneg_in)
    o_ref[0] = y.astype(o_ref.dtype)


def dw3x3(
    x: jax.Array,
    w: jax.Array,
    *,
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
    relu: bool = False,
    quant_out_recip: Optional[float] = None,
    nonneg_in: bool = False,
    bh: int = 16,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``epilogue(dw_conv3x3(x, w))`` for stride 1, SAME padding.

    x: [N, H, W, C]; w: [3, 3, C] per-channel taps.
    scale/shift: [C] fused affine (folded BN * Ka*Kw), defaults to identity.
    quant_out_recip: fuse the consumer's SLFP<3,4> act quantize (1/Ka).
    bh: rows per block (even; VMEM window is (bh+2) x (W+2) x C).
    """
    n, h, wdt, c = x.shape
    assert w.shape[:2] == (3, 3) and w.shape[-1] == c, w.shape
    assert bh % 2 == 0, "bh must be even (halo block offset in 2-row units)"
    if scale is None:
        scale = jnp.ones((c,), jnp.float32)
    if shift is None:
        shift = jnp.zeros((c,), jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bh = min(bh, _cdiv(h, 2) * 2)
    hp = _cdiv(h, bh) * bh
    # top halo 1, bottom halo 1 + round-up (+2 so the last halo block exists)
    xp = jnp.pad(x, ((0, 0), (1, hp - h + 3), (1, 1), (0, 0)))

    kern = functools.partial(
        _dw_kernel, bh=bh, W=wdt, relu=relu,
        quant=quant_out_recip is not None,
        recip_out=float(quant_out_recip or 1.0), nonneg_in=nonneg_in)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, hp, wdt, c), out_dtype),
        grid=(n, hp // bh),
        in_specs=[
            # main rows [i*bh, i*bh+bh) of the padded input
            pl.BlockSpec((1, bh, wdt + 2, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            # halo rows [(i+1)*bh, (i+1)*bh+2) in 2-row block units
            pl.BlockSpec((1, 2, wdt + 2, c),
                         lambda b, i: (b, (i + 1) * bh // 2, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, wdt, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=18 * n * hp * wdt * c,
            bytes_accessed=n * hp * wdt * c * (x.dtype.itemsize + 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, xp, w, scale.reshape(1, c).astype(jnp.float32),
      shift.reshape(1, c).astype(jnp.float32))
    return out[:, :h]
