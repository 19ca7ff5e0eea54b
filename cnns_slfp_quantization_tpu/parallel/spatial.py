"""Spatial partitioning of convolutions with halo exchange.

The CNN analog of sequence/context parallelism (SURVEY.md §2.3): feature
maps are sharded over the H dimension across the mesh; each device convolves
its slab after exchanging ``k//2`` boundary rows with its neighbors over ICI
(``lax.ppermute`` inside ``shard_map`` — non-circular permutes zero-fill the
outer boundaries, which matches SAME zero padding).

Use when activations are too large for one chip's HBM (early high-resolution
layers) — not required for the 32/224-pixel workloads of this zoo, but the
primitive is what a production deployment scales spatial dims with.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _halo_exchange(x_local: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Concatenate `halo` rows from the H-neighbors (zeros at the edges)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]  # send to next shard
    up = [(i + 1, i) for i in range(n - 1)]    # send to previous shard
    from_prev = lax.ppermute(x_local[:, -halo:], axis_name, down)
    from_next = lax.ppermute(x_local[:, :halo], axis_name, up)
    del idx
    return jnp.concatenate([from_prev, x_local, from_next], axis=1)


def spatial_conv2d(
    x: jax.Array,
    w: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = "data",
    feature_group_count: int = 1,
) -> jax.Array:
    """SAME, stride-1 NHWC conv with x sharded over H on ``axis_name``.

    x: [N, H, W, C] (H divisible by the mesh axis size), w: [kh, kw, I, O]
    with odd kh.  Each shard computes its H-slab after a halo exchange;
    output sharding matches the input.
    """
    kh, kw = w.shape[0], w.shape[1]
    halo = kh // 2

    def local(x_local, w):
        if halo:
            x_ext = _halo_exchange(x_local, halo, axis_name)
        else:
            x_ext = x_local
        return lax.conv_general_dilated(
            x_ext, w, (1, 1),
            padding=((0, 0), (kw // 2, kw // 2)),  # H handled by the halo
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=feature_group_count,
            preferred_element_type=jnp.float32,
        ).astype(x_local.dtype)

    spec_x = P(None, axis_name, None, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec_x, P()),
                   out_specs=spec_x)
    return fn(x, w)
