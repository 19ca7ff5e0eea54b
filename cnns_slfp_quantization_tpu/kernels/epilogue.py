"""Dual-output Pallas epilogue for the ResNet bottleneck block boundary.

Round-3 perf attribution (docs/DESIGN.md, tools/bench_quant_sites.py) showed
the single largest quantize cost is the standalone "blockin" pass: a
mid-stage block's output feeds the next block's conv1 *quantized* and its
residual add *raw*, so the quantize cannot ride a conv epilogue, and XLA
multi-output fusion of the two consumers duplicates the conv instead
(measured: 7831 vs 9593 img/s).

This kernel is the remaining structural move: read the conv3 output tile
once, apply the folded BN affine + residual + ReLU, and write BOTH the raw
bf16 block output and the SLFP<3,4>-quantized bf16 next-block input in one
HBM pass.  Trade-off being measured: the conv loses its fused epilogue (its
f32 output is materialized for this kernel to read), in exchange for
removing the standalone pass's extra read.

Semantics match ``fused_apply``'s consumer path exactly: ``raw =
bf16(relu(y*s + t + identity))`` and ``q = _act_bf16_bits(raw, recip)`` —
the quantize consumes the bf16-rounded raw tensor, as the standalone pass
does.  Reference math: bottleneck tail nets_imgnet/resnet50.py:84-90 +
act-quantize utils/conv2d_func.py:21.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cnns_slfp_quantization_tpu.ops.sfp import _act_bf16_bits


def _kernel(y_ref, id_ref, s_ref, t_ref, raw_ref, q_ref, *, recip):
    y = y_ref[:] * s_ref[:] + t_ref[:] + id_ref[:].astype(jnp.float32)
    y = jnp.maximum(y, 0.0)
    raw = y.astype(jnp.bfloat16)
    raw_ref[:] = raw
    q_ref[:] = _act_bf16_bits(raw, recip, 8, True)


def dual_epilogue(y, identity, scale, shift, recip: float, *,
                  interpret: bool = False):
    """(raw_bf16, quantized_bf16) from one pass over the conv output.

    y: f32 (..., C) conv3 output;  identity: bf16 (..., C) residual;
    scale/shift: f32 (C,) folded BN affine (Ka*Kw pre-merged);
    recip: static 1/Ka of the next block's conv1.
    """
    orig_shape = y.shape
    c = orig_shape[-1]
    r = int(np.prod(orig_shape[:-1]))
    y2 = y.reshape(r, c)
    id2 = identity.astype(jnp.bfloat16).reshape(r, c)
    s2 = jnp.asarray(scale, jnp.float32).reshape(1, c)
    t2 = jnp.asarray(shift, jnp.float32).reshape(1, c)

    # block rows: the kernel holds 4 live buffers/block (f32 in, bf16
    # identity, 2 bf16 outs = 10 B/elem) and Pallas double-buffers each for
    # the grid pipeline — budget ~0.5MB of f32 input per block so the total
    # stays ~2.5MB, well under the 16MB scoped-vmem limit
    br = max(8, min((r + 7) // 8 * 8, (512 * 1024) // (4 * c) // 8 * 8))
    rp = -(-r // br) * br  # pad rows to a block multiple
    if rp != r:
        y2 = jnp.pad(y2, ((0, rp - r), (0, 0)))
        id2 = jnp.pad(id2, ((0, rp - r), (0, 0)))
    grid = (rp // br,)
    raw, q = pl.pallas_call(
        functools.partial(_kernel, recip=float(recip)),
        out_shape=(jax.ShapeDtypeStruct((rp, c), jnp.bfloat16),
                   jax.ShapeDtypeStruct((rp, c), jnp.bfloat16)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(y2, id2, s2, t2)
    return (raw[:r].reshape(orig_shape), q[:r].reshape(orig_shape))
