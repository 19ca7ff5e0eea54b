"""Multi-host / multi-process support (SPMD over a pod slice).

The reference is strictly single-process (SURVEY.md §2.3); this is the
TPU-native scaling layer: each host runs the same program, joins via
``jax.distributed.initialize``, loads its shard of the input, and assembles
global device arrays.  XLA/GSPMD handles all cross-host collectives (over
ICI within a slice, DCN across slices).

Recovery model (SURVEY.md §5): restart-based — on failure, relaunch all
processes and restore from the latest orbax checkpoint; step-level state
lives entirely in the checkpointed train state.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-process runtime (no-op in single-process runs).

    With TPU auto-detection (GKE/TPU VMs) all arguments may be None.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_batch(mesh: Mesh, local_images: np.ndarray,
                 local_labels: np.ndarray):
    """Assemble per-host local batches into globally-sharded arrays.

    Each process passes its local shard (global_batch_size / num_processes
    leading dim); the result is a global jax.Array sharded over the 'data'
    axis (jax.make_array_from_process_local_data handles the host->device
    scatter)."""
    img_sharding = NamedSharding(
        mesh, P(*(("data",) + (None,) * (local_images.ndim - 1))))
    lab_sharding = NamedSharding(mesh, P("data"))
    images = jax.make_array_from_process_local_data(img_sharding, local_images)
    labels = jax.make_array_from_process_local_data(lab_sharding, local_labels)
    return images, labels


def shard_data_iterator(it, process_index: Optional[int] = None,
                        process_count: Optional[int] = None,
                        total: Optional[int] = None):
    """Round-robin split of a host iterator across processes (per-host input
    pipeline: each host reads only its 1/num_processes of the batches).

    The stream is truncated to ``(total // process_count) * process_count``
    batches so every host yields the SAME number of batches: a ragged tail
    would make hosts invoke the SPMD train step a different number of times
    and desync/hang the run.  ``total`` defaults to ``len(it)`` when the
    iterable is sized; unsized iterators with a ragged tail are the
    caller's responsibility.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if total is None and hasattr(it, "__len__"):
        total = len(it)
    stop = (total // pc) * pc if total is not None else None
    for i, batch in enumerate(it):
        if stop is not None and i >= stop:
            return
        if i % pc == pi:
            yield batch
