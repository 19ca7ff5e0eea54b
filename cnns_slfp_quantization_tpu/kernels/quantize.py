"""Pallas TPU kernels for SLFP quantization (north-star deliverable).

Two kernels:

- :func:`slfp34_act_quantize`: blocked elementwise SLFP<3,4> activation
  fake-quantize.  Bit-domain implementation: exponent/mantissa manipulation
  on int32 views (round-half-even mantissa rounding via carry-propagating
  integer add), the linear->log mantissa conversion as a shift-magic
  correction (``ml = j + ((0x7ffc >> j) & 1)``), and the 2**(ml/16) mantissa
  patterns via a 15-select binary tree — no transcendentals, no gathers.
  Produces bit-identical results to ``ops.sfp.quantize_act(x, 8)``.
- :func:`slfp34_quantize_pack`: same, but emits real uint8 codes
  (sign | 3e | 4m), for staged pipelines that want 1-byte activations in HBM.

The boundary handling exploits that positive-float bit patterns are
order-isomorphic to their values, so subnormal flush / clamp are integer
compares against constant bit patterns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = lambda v: np.float32(v)
_BITS = lambda v: np.int32(np.float32(v).view(np.int32))

# 23-bit mantissa patterns of float32(2**(ml/16)) for ml = 0..15
_P_TABLE = [
    int(np.float32(2.0 ** (k / 16.0)).view(np.int32)) & 0x007FFFFF
    for k in range(16)
]
# c(j) = round(16*log2(1+j/16)) - j verified in {0,1}; bit i of 0x7ffc = c(i)
_ML_MAGIC = sum(
    (int(np.round(16 * np.log2(1 + j / 16.0))) - j) << j for j in range(16)
)
assert _ML_MAGIC == 0x7FFC


def _tree_select(idx: jax.Array, table) -> jax.Array:
    """table[idx] for a 16-entry int table via a binary select tree."""
    b0 = (idx & 1) != 0
    t = [jnp.where(b0, np.int32(table[2 * i + 1]), np.int32(table[2 * i]))
         for i in range(8)]
    b1 = (idx & 2) != 0
    t = [jnp.where(b1, t[2 * i + 1], t[2 * i]) for i in range(4)]
    b2 = (idx & 4) != 0
    t = [jnp.where(b2, t[2 * i + 1], t[2 * i]) for i in range(2)]
    return jnp.where((idx & 8) != 0, t[1], t[0])


def slfp34_act_bits(x: jax.Array) -> jax.Array:
    """Bit-domain SLFP<3,4> activation quantize (jnp; usable in/out of
    Pallas).  Matches ops.sfp.quantize_act(x, 8) bit-for-bit on finite
    inputs."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    sign = bits & np.int32(-0x80000000)
    ab = bits & np.int32(0x7FFFFFFF)
    # round mantissa to 4 bits, half-to-even; carry propagates into exponent
    lsb = (ab >> 19) & 1
    r = (ab + np.int32(0x3FFFF) + lsb) & np.int32(-0x80000)
    j = (r >> 19) & 15
    ml = j + ((np.int32(_ML_MAGIC) >> j) & 1)
    out = (r & np.int32(-0x00800000)) | _tree_select(ml, _P_TABLE)
    # boundaries: positive-float bit order == value order
    out = jnp.where(ab < _BITS(0.0625),
                    jnp.where(ab == 0, np.int32(0), _BITS(1e-10)), out)
    out = jnp.where((ab >= _BITS(0.0625)) & (ab < _BITS(0.125)),
                    _BITS(0.125), out)
    out = jnp.where(ab > _BITS(15.32165), _BITS(15.32165), out)
    return jax.lax.bitcast_convert_type(out | sign, jnp.float32)


def _quant_kernel(x_ref, o_ref):
    o_ref[:] = slfp34_act_bits(x_ref[:]).astype(o_ref.dtype)


def slfp34_act_quantize(x: jax.Array, *, block_rows: int = 64) -> jax.Array:
    """Pallas-blocked SLFP<3,4> activation quantize.

    Flattens to (rows, 1024) tiles — 2-D blocks with a 128-multiple lane
    dimension, per TPU tiling constraints.
    """
    orig_shape, orig_dtype = x.shape, x.dtype
    lanes = 1024
    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % lanes
    if pad:
        flat = jnp.pad(flat, (0, pad))
    grid_rows = flat.shape[0] // lanes
    br = min(block_rows, grid_rows)
    while grid_rows % br:
        br -= 1
    x2 = flat.reshape(grid_rows, lanes)
    out = pl.pallas_call(
        _quant_kernel,
        out_shape=jax.ShapeDtypeStruct((grid_rows, lanes), orig_dtype),
        grid=(grid_rows // br,),
        in_specs=[pl.BlockSpec((br, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2)
    return out.reshape(-1)[:n].reshape(orig_shape)


def slfp34_pack_bits(x: jax.Array) -> jax.Array:
    """Quantize + encode to uint8 codes (sign|3e|4m) in one pass."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    sign7 = (bits >> 24) & np.int32(0x80)
    ab = bits & np.int32(0x7FFFFFFF)
    lsb = (ab >> 19) & 1
    r = (ab + np.int32(0x3FFFF) + lsb) & np.int32(-0x80000)
    j = (r >> 19) & 15
    ml = j + ((np.int32(_ML_MAGIC) >> j) & 1)
    e = (r >> 23) - 127  # unbiased exponent
    code7 = jnp.clip((e + 4) * 16 + ml, 0, 127)
    code7 = jnp.where(ab < _BITS(0.125), 16, code7)  # subnormal floor 0.125
    code7 = jnp.where(ab < _BITS(0.0625), 0, code7)  # pseudo-zero
    code7 = jnp.where(ab > _BITS(15.32165), 127, code7)
    return (sign7 | code7).astype(jnp.uint8)
