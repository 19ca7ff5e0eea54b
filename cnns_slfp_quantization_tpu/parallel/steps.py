"""Sharded train/eval step construction over a ('data','model') mesh.

Usage: build state on host, :func:`shard_state` it onto the mesh, then run
the jitted step with batch arrays placed via :func:`place_batch`.  XLA/GSPMD
inserts the gradient reductions (over 'data') and the TP
all-gather/reduce-scatter pairs (over 'model'); no explicit collectives.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cnns_slfp_quantization_tpu.parallel import mesh as mesh_lib
from cnns_slfp_quantization_tpu.train.loop import TrainState
from cnns_slfp_quantization_tpu.train.optimizers import QSGDState


def state_shardings(state: TrainState, mesh: Mesh):
    """Sharding pytree matching a TrainState under the TP policy."""
    pshard = mesh_lib.param_shardings(state.params, mesh)
    bshard = mesh_lib.param_shardings(state.batch_stats, mesh)
    rep = mesh_lib.replicated(mesh)
    if isinstance(state.opt_state, QSGDState):
        # stats (track_stats=True: scalar updated/stuck counters) replicate;
        # tree structure must match or device_put fails on the state.
        sstats = jax.tree.map(lambda _: rep, state.opt_state.stats)
        oshard = QSGDState(count=rep, momentum=pshard, stats=sstats)
    else:
        oshard = jax.tree.map(lambda _: rep, state.opt_state)
    return TrainState(params=pshard, batch_stats=bshard, opt_state=oshard,
                      step=rep)


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    return jax.tree.map(jax.device_put, state, state_shardings(state, mesh))


def place_batch(mesh: Mesh, images, labels):
    img = jax.device_put(images, mesh_lib.batch_sharding(mesh, images.ndim))
    lab = jax.device_put(labels, NamedSharding(mesh, P("data")))
    return img, lab


def jit_train_step(train_step, donate: bool = True):
    """Jit a loop.make_train_step step; input shardings come from the
    committed placement of the (pre-sharded) state and batch."""
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def jit_eval_step(eval_step):
    return jax.jit(eval_step)
