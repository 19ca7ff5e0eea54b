"""VMEM-resident fused bottleneck chain (conv1 -> conv2 -> conv3) kernel.

The one structural rewrite XLA's fusion cannot perform: a ResNet bottleneck's
intermediates (conv1's and conv2's outputs) never touch HBM.  XLA fuses
elementwise chains into conv epilogues but always materializes every conv
output; a stride-1 mid-stage bottleneck therefore moves ~24 bytes/element of
the block stream (conv1 in 2 + out 0.5, conv2 0.5+0.5, conv3 0.5 + identity
2 + raw-out 2, standalone block-input quantize 2+2 — docs/DESIGN.md).  This
kernel computes the whole chain on a batch tile held in VMEM and moves only
16 B/elem: read quantized input + identity, write raw + quantized output.

Per grid step (one tile of ``bi`` images; whole 14x14/7x7 spatial extent so
the 3x3 conv needs no cross-tile halo):

  y1 = relu(x_q @ W1 * a1 + b1)          SLFP-quantized for conv2 in-register
  y2 = relu(conv3x3(y1) ...)             9 shifted MXU matmuls on a
                                         zero-padded VMEM copy
  y3 = relu(y2 @ W3 * a3 + b3 + identity)
  out_raw = bf16(y3); out_q = SLFP(y3 * recip_next)

Only the 14x14x1024 / 7x7x2048 stages are eligible (weights + tile fit the
~16MB VMEM budget; the 56/28px stages' tiles do not).  Numerics match the
production fused executor to <=1 ulp of scaled-input drift (the quantizes
use the same bit-domain SLFP<3,4> math, kernels/quantize.py).

A/B harness: tools/bench_chain.py.  Verdict: docs/DESIGN.md round 5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cnns_slfp_quantization_tpu.kernels.quantize import slfp34_act_bits


def _q(x, recip):
    """Scaled SLFP<3,4> activation quantize, bf16 result (in-kernel)."""
    return slfp34_act_bits(x * np.float32(recip)).astype(jnp.bfloat16)


def _chain_kernel(xq_ref, idn_ref, w1_ref, w2_ref, w3_ref,
                  a1_ref, b1_ref, a2_ref, b2_ref, a3_ref, b3_ref,
                  raw_ref, q_ref, *, H, W, M, recip2, recip3, recip_next,
                  emit_raw):
    bi = xq_ref.shape[0]
    C = xq_ref.shape[-1]
    x = xq_ref[:].reshape(bi * H * W, C)

    # conv1 (1x1): MXU matmul + affine + relu + quantize, all in VMEM
    y1 = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    y1 = y1 * a1_ref[:] + b1_ref[:]
    y1 = jnp.maximum(y1, 0.0)
    y1 = _q(y1, recip2).reshape(bi, H, W, M)

    # conv2 (3x3, pad 1): zero-pad spatially in VMEM, 9 shifted matmuls
    y1p = jnp.pad(y1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y2 = jnp.zeros((bi * H * W, M), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = y1p[:, dy:dy + H, dx:dx + W, :].reshape(bi * H * W, M)
            y2 = y2 + jnp.dot(tap, w2_ref[dy, dx],
                              preferred_element_type=jnp.float32)
    y2 = y2 * a2_ref[:] + b2_ref[:]
    y2 = jnp.maximum(y2, 0.0)
    y2 = _q(y2, recip3)

    # conv3 (1x1) + residual + relu
    y3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.float32)
    y3 = y3 * a3_ref[:] + b3_ref[:]
    y3 = y3 + idn_ref[:].reshape(bi * H * W, C).astype(jnp.float32)
    y3 = jnp.maximum(y3, 0.0)
    if emit_raw:
        raw_ref[:] = y3.astype(jnp.bfloat16).reshape(bi, H, W, C)
    q_ref[:] = _q(y3, recip_next).reshape(bi, H, W, C)


@functools.partial(
    jax.jit,
    static_argnames=("recip2", "recip3", "recip_next", "emit_raw",
                     "block_images", "interpret"))
def bottleneck_chain(xq, identity, w1, w2, w3, a1, b1, a2, b2, a3, b3, *,
                     recip2: float, recip3: float, recip_next: float,
                     emit_raw: bool = True, block_images: int = 4,
                     interpret: bool = False):
    """Fused stride-1 bottleneck: returns (raw_bf16, quantized_bf16).

    ``xq``: (N,H,W,C) quantized block input (bf16); ``identity``: (N,H,W,C)
    raw block input (bf16).  ``w1`` (C,M), ``w2`` (3,3,M,M), ``w3`` (M,C)
    pre-quantized bf16 weights; ``a*``/``b*`` f32 per-channel BN-folded
    affines (Ka*Kw merged).  ``emit_raw=False`` for the last block of a
    stage (only the quantized form has a consumer).
    """
    N, H, W, C = xq.shape
    M = w1.shape[1]
    bi = block_images
    while N % bi:
        bi -= 1
    grid = (N // bi,)

    def tile(i):
        return (i, 0, 0, 0)

    full = lambda i: (0, 0)
    full4 = lambda i: (0, 0, 0, 0)
    vec = lambda i: (0, 0)

    a1r, b1r = a1.reshape(1, M), b1.reshape(1, M)
    a2r, b2r = a2.reshape(1, M), b2.reshape(1, M)
    a3r, b3r = a3.reshape(1, C), b3.reshape(1, C)

    kern = functools.partial(
        _chain_kernel, H=H, W=W, M=M, recip2=recip2, recip3=recip3,
        recip_next=recip_next, emit_raw=emit_raw)
    out_shapes = [jax.ShapeDtypeStruct((N, H, W, C), jnp.bfloat16),
                  jax.ShapeDtypeStruct((N, H, W, C), jnp.bfloat16)]
    raw, q = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bi, H, W, C), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, H, W, C), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, M, M), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, C), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bi, H, W, C), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, H, W, C), tile, memory_space=pltpu.VMEM),
        ],
        # v5e has 128MB VMEM; the default scoped budget (~16MB) OOMs on the
        # kernel's live set (padded y1 + 9 tap temporaries + f32 y3 + the
        # double-buffered in/out blocks) at 14x14x1024 — raise it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xq, identity, w1, w2, w3, a1r, b1r, a2r, b2r, a3r, b3r)
    return raw, q
