"""Device mesh + sharding policy (TPU-native scaling layer).

The reference is strictly single-process single-GPU (SURVEY.md §2.3: no
DP/TP/collectives anywhere); this module is the from-scratch TPU scaling
design it lacks:

- ``data`` axis: batch-dim sharding (data parallel).  Gradients of
  replicated/TP-sharded params are reduced by XLA-inserted collectives over
  ICI (GSPMD), overlapped with compute by the latency-hiding scheduler.
- ``model`` axis: tensor parallelism for CNNs = out-channel sharding of conv
  kernels (H,W,I,O -> shard O) and dense kernels (I,O -> shard O); BN
  scale/bias/stats follow their channel dim.  XLA propagates the channel
  sharding through elementwise ops and inserts all-gathers/reduce-scatters
  where layouts change.

Everything is expressed with ``jax.sharding`` (Mesh + NamedSharding); no
hand-written collectives are needed for the standard path.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    Defaults: all available devices on the data axis.  ``data * model`` must
    equal the device count used.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))


def _spec_for(path: tuple, leaf, model_size: int) -> P:
    """Tensor-parallel spec for one param leaf.

    Conv kernels (H,W,I,O) and dense kernels (I,O): shard the out-feature
    dim over 'model' when divisible.  1-D per-channel params (BN scale/bias,
    conv bias): shard over 'model' when divisible — they follow the channel
    layout of the activations.
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    shape = leaf.shape
    if model_size == 1:
        return P()
    if names and names[-1] == "kernel" and len(shape) in (2, 4):
        if shape[-1] % model_size == 0:
            return P(*([None] * (len(shape) - 1) + ["model"]))
    if len(shape) == 1 and shape[0] % model_size == 0 and names:
        if names[-1] in ("bias", "scale", "mean", "var"):
            return P("model")
    return P()


def param_shardings(tree, mesh: Mesh):
    """NamedSharding pytree for params/batch_stats under the TP policy."""
    model_size = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf, model_size)),
        tree,
    )


def shard_tree(tree, shardings):
    """Device_put a pytree onto its shardings."""
    return jax.tree.map(jax.device_put, tree, shardings)
