"""Shared CLI engine for the CIFAR / ImageNet drivers.

Reproduces the reference drivers' control flow (cifar100_train_eval.py:84-322,
imgnet_train_eval.py:69-325): data -> model -> optimizer -> optional
calibration (--pre_reference) -> epoch loop of train/test -> best-checkpoint
save.  Divergences (documented in SURVEY.md §5):

- The reference calls ``optimizer.step(); lr_schedu.step()`` once per epoch
  *before* training (cifar100_train_eval.py:307-308) — a quirk that nudges
  weights through stale momentum; not reproduced.
- Checkpoints are orbax trees (``--pretrain_dir`` still accepts a torch
  ``.pth``, converted on load).
- ``--synthetic`` runs on generated data when no dataset is on disk
  (zero-egress environment).
"""

from __future__ import annotations

import json
import os
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from cnns_slfp_quantization_tpu import calib, models
from cnns_slfp_quantization_tpu.calib import calibrate as calibrate_lib
from cnns_slfp_quantization_tpu.data import synthetic
from cnns_slfp_quantization_tpu.train import checkpoint, loop, optimizers
from cnns_slfp_quantization_tpu.utils.logging import MetricLogger


def add_common_args(parser):
    parser.add_argument("--root_dir", type=str, default="./")
    parser.add_argument("--data_dir", type=str, default="./data")
    parser.add_argument("--retrain", action="store_true", default=False)
    parser.add_argument("--save_model", action="store_true", default=False)
    parser.add_argument("--pre_reference", action="store_true", default=False)
    parser.add_argument("--pretrain", action="store_true", default=False)
    parser.add_argument("--pretrain_dir", type=str, default=None)
    parser.add_argument("--optimizer", type=str, default="SGD")
    parser.add_argument("--Qbits", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--wd", type=float, default=5e-4)
    parser.add_argument("--num", type=int, default=0)
    parser.add_argument("--log_interval", type=int, default=100)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--synthetic", action="store_true", default=False,
                        help="use generated data (no dataset needed)")
    parser.add_argument("--synthetic_batches", type=int, default=None,
                        help="train batches per epoch under --synthetic "
                             "(default: 20 cifar / 10 imgnet)")
    parser.add_argument("--train_subset", type=float, default=1.0,
                        help="class-stratified fraction of the train set for "
                             "fine-tune recovery (reference README.md:12 "
                             "claims 6%% suffices: --train_subset 0.06)")
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="conv/matmul compute dtype (bfloat16 = MXU rate)")
    parser.add_argument("--mesh_data", type=int, default=0,
                        help="data-parallel mesh size (0 = single device)")
    parser.add_argument("--mesh_model", type=int, default=1,
                        help="tensor-parallel mesh size")
    parser.add_argument("--resume", type=str, default=None,
                        help="resume full train state (params+opt+step) from "
                             "an orbax checkpoint dir")
    parser.add_argument("--save_state", action="store_true", default=False,
                        help="checkpoint the full train state each epoch "
                             "(enables --resume restart recovery)")
    parser.add_argument("--debug_nans", action="store_true", default=False,
                        help="enable jax_debug_nans (SURVEY.md §5 sanitizer)")
    parser.add_argument("--jax_cache", type=str, default="/tmp/jax_cache",
                        help="persistent compilation cache dir ('' disables)")
    # accepted for reference-CLI parity; GPU pinning is meaningless on TPU
    parser.add_argument("--use_gpu", type=str, default="0")
    parser.add_argument("--cluster", action="store_true", default=False)


def configure_runtime(cfg) -> None:
    import os as _os

    if getattr(cfg, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    cache = getattr(cfg, "jax_cache", "")
    if cache:
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_model(cfg, net: str, image_size: int):
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    model = models.create_model(net, cfg.Qbits, compute_dtype=compute_dtype,
                                ratio=getattr(cfg, "ratio", 1))
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init(rng, x, train=False)
    return model, variables


def load_pretrained(cfg, variables):
    path = cfg.pretrain_dir
    if path is None:
        return variables
    if str(path).endswith(".pth"):
        return checkpoint.load_pth(path, variables)
    restored = checkpoint.restore(path)
    return restored


def run_calibration(cfg, model_name, net, variables, eval_batches,
                    divisor=15.5, total_images=1000):
    """--pre_reference: dump max_inout/<net>.txt + max_weight_<net>.txt
    (cifar100_train_eval.py:279-301) and a JSON scale file."""
    model = model_name  # model with capture="absmax"
    result = calibrate_lib.calibrate(model, variables, eval_batches,
                                     max_images=total_images)
    import os as _os
    out_root = getattr(cfg, "root_dir", ".") or "."
    _os.makedirs(out_root, exist_ok=True)
    with open(_os.path.join(out_root, f"max_inout_{net}.txt"), "w") as f:
        for idx in sorted(result.input_absmax):
            f.write(f"Layer {idx} Max Absolute Input:\n")
            f.write(str(result.input_absmax[idx]) + "\n\n")
        for idx in sorted(result.output_absmax):
            f.write(f"Layer {idx} Max Absolute Output:\n")
            f.write(str(result.output_absmax[idx]) + "\n\n")
    with open(_os.path.join(out_root, f"max_weight_{net}.txt"), "w") as f:
        for idx in sorted(result.weight_absmax):
            f.write(f"Layer {idx} Max Absolute weight:\n")
            f.write(str(result.weight_absmax[idx]) + "\n\n")
    # generated artifact -> under --root_dir, never into the package source
    calib.save_scales(f"{net}_calibrated", result.ka_max(), result.kw_max(),
                      divisor, out_dir=_os.path.join(out_root, "calib"))
    print(f"Results saved to max_weight_{net}.txt")
    return result


def _state_meta_path(state_path: str) -> str:
    """Sidecar for non-pytree train-loop state (epoch alignment + best acc)."""
    return str(state_path).rstrip("/") + ".meta.json"


def build_mesh(cfg):
    """('data','model') mesh from --mesh_data/--mesh_model (None if both
    defaulted: single-device path, zero sharding overhead)."""
    md = getattr(cfg, "mesh_data", 0)
    mm = getattr(cfg, "mesh_model", 1)
    if not md and mm <= 1:
        return None
    from cnns_slfp_quantization_tpu.parallel import make_mesh

    if md:
        # use exactly the requested data*model devices (a 4x1 request on an
        # 8-device host is valid — the rest stay idle)
        mesh = make_mesh(data=md, model=mm,
                         devices=jax.devices()[:md * mm])
    else:
        mesh = make_mesh(data=None, model=mm)
    print(f"==> device mesh {dict(mesh.shape)} "
          f"({jax.process_count()} process(es))")
    return mesh


class PlacedBatches:
    """Re-iterable batch stream placed onto a ('data','model') mesh.

    Single-process: every batch is device_put with the batch dim sharded
    over 'data' (weights replicated / TP-sharded by the state shardings).
    Multi-process: each host keeps every ``process_count``-th batch of its
    local stream and contributes it as one shard of a global batch
    (``multihost.global_batch`` -> jax.make_array_from_process_local_data),
    so the global batch size is local_batch * process_count.
    """

    def __init__(self, batches, mesh):
        self._batches = batches
        self._mesh = mesh

    def __len__(self):
        n = len(self._batches)
        pc = jax.process_count()
        return n // pc if pc > 1 else n

    def __iter__(self):
        from cnns_slfp_quantization_tpu.parallel import multihost, steps

        ndata = self._mesh.shape["data"]
        it = iter(self._batches)
        if jax.process_count() > 1:
            # total=len(...) lets the sharder truncate the ragged tail so
            # every host steps the same number of times
            it = multihost.shard_data_iterator(it, total=len(self._batches))
            for images, labels in it:
                yield multihost.global_batch(self._mesh, np.asarray(images),
                                             np.asarray(labels))
            return
        for images, labels in it:
            if images.shape[0] % ndata:
                raise ValueError(
                    f"batch size {images.shape[0]} not divisible by the "
                    f"data-parallel mesh axis ({ndata}); pick "
                    f"--train_batch_size/--eval_batch_size divisible by "
                    f"--mesh_data")
            yield steps.place_batch(self._mesh, jnp.asarray(images),
                                    jnp.asarray(labels))


class _NullLogger:
    def scalar(self, *a, **k):
        pass

    def close(self):
        pass


def _save_gathered(path, tree):
    """Checkpoint a possibly globally-sharded pytree.

    Single-process (even with a mesh): every shard is addressable,
    ``device_get`` suffices.  Multi-process: shards live on other hosts, so
    gather to host-replicated numpy first (process_allgather, tiled=True —
    globally sharded arrays gather to their global value) and let EVERY
    process call the orbax save: orbax synchronizes processes internally and
    only the primary host writes — a process-0-only call deadlocks in its
    global barrier (measured; tests/test_multiprocess.py guards this).
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(tree, tiled=True)
        checkpoint.save(path, gathered)
    else:
        checkpoint.save(path, jax.device_get(tree))


def run_main_loop(cfg, model, variables, train_batches, eval_batches,
                  *, max_epochs, log_dir, ckpt_path, steps_per_epoch,
                  milestones=(75, 85, 100), eval_max_images=None,
                  has_dropout=False):
    """Epoch loop (cifar100_train_eval.py:303-320).

    With ``--mesh_data``/``--mesh_model`` the same loop runs SPMD over a
    ('data','model') mesh: state sharded once up front (DP-replicated /
    TP-out-channel weights), every batch placed with the batch dim sharded
    over 'data', gradient reductions and TP boundary collectives inserted by
    GSPMD (SURVEY.md §2.3).  Multi-host runs additionally split the input
    stream per process (parallel/multihost.py).
    """
    # metrics from process 0 only (every process computes identical
    # replicated metrics; concurrent writers would interleave the JSONL)
    logger = (MetricLogger(log_dir) if jax.process_index() == 0
              else _NullLogger())
    mesh = build_mesh(cfg)
    if mesh is not None:
        train_batches = PlacedBatches(train_batches, mesh)
        eval_batches = PlacedBatches(eval_batches, mesh)
        # multi-process runs consume only len//process_count global steps
        # per epoch (each host contributes every process_count-th local
        # batch as one shard of a global batch) — the LR schedule, resume
        # epoch numbering, and the meta sidecar must all use the wrapped
        # length or they drift by the process count.
        steps_per_epoch = max(len(train_batches), 1)
    lr_sched = loop.multistep_lr(cfg.lr, milestones, 0.1, steps_per_epoch)
    tx = optimizers.create_optimizer(cfg.optimizer, lr_sched, cfg.Qbits,
                                     weight_decay=cfg.wd)
    state = loop.TrainState.create(variables, tx)
    resumed_meta = {}
    if getattr(cfg, "resume", None):
        # restart-based recovery (SURVEY.md §5): restore the full train
        # state (params, BN stats, optimizer momentum, step counter)
        restored = checkpoint.restore(cfg.resume, jax.device_get(state))
        state = jax.tree.map(jnp.asarray, restored)
        print(f"==> resumed train state from {cfg.resume} "
              f"(step {int(state.step)})")
        # sidecar metadata: epoch numbering (and therefore the per-epoch
        # fold_in RNG stream + multistep LR alignment) is derived from
        # steps_per_epoch; resuming with a different batch/dataset size
        # silently shifts all three, and acc_max restarting at 0.0 could let
        # --save_model overwrite a better pre-restart best checkpoint.
        meta_path = _state_meta_path(cfg.resume)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                resumed_meta = json.load(f)
            if resumed_meta.get("steps_per_epoch") not in (
                    None, steps_per_epoch):
                import warnings

                warnings.warn(
                    f"--resume: checkpoint was saved with steps_per_epoch="
                    f"{resumed_meta['steps_per_epoch']} but this run has "
                    f"{steps_per_epoch}; epoch numbering, the per-epoch RNG "
                    f"stream and the multistep LR schedule will not line up "
                    f"with the original run", stacklevel=2)
    if mesh is not None:
        from cnns_slfp_quantization_tpu.parallel import steps as psteps

        state = psteps.shard_state(state, mesh)
    train_step = jax.jit(loop.make_train_step(model, tx, has_dropout),
                         donate_argnums=0)
    eval_step = jax.jit(loop.make_eval_step(model))

    rng = jax.random.PRNGKey(cfg.num)
    acc_data, acc_max = [], float(resumed_meta.get("acc_max", 0.0))
    # resume continues the epoch numbering from the restored step counter so
    # the per-epoch fold_in key stream matches an uninterrupted run (epoch 0
    # keys must not replay after a restart)
    start_epoch = int(state.step) // max(steps_per_epoch, 1)
    for epoch in range(start_epoch, max_epochs):
        if cfg.retrain:
            t0 = time.time()
            # distinct dropout/shuffle key stream per epoch (the same base
            # rng would replay epoch 0's keys every epoch)
            epoch_rng = jax.random.fold_in(rng, epoch)
            state = loop.train_epoch(
                train_step, state, train_batches, epoch_rng,
                log_interval=cfg.log_interval, epoch=epoch)
            logger.scalar("epoch_time", time.time() - t0, epoch)
        metrics = loop.evaluate(eval_step, state.variables(), eval_batches,
                                max_images=eval_max_images)
        acc = metrics["top1"]
        acc_data.append(acc)
        print(f"------ Precision@1: {acc:.2f}%  Precision@5: "
              f"{metrics['top5']:.2f}%  ({metrics['images']} images)")
        logger.scalar("Precision@1", acc, epoch)
        logger.scalar("Precision@5", metrics["top5"], epoch)
        # >= (not the reference's strict >, cifar100_train_eval.py:316): with
        # acc_max starting at 0.0 a first epoch landing at exactly 0.00%
        # would otherwise never checkpoint — the best-so-far model must
        # always exist on disk under --save_model.
        if cfg.save_model and acc >= acc_max:
            acc_max = acc
            _save_gathered(ckpt_path, state.variables())
            print(f"max acc : {acc_max}\nsaving model....")
        if getattr(cfg, "save_state", False):
            state_path = ckpt_path + "_state"
            _save_gathered(state_path, state)
            if jax.process_index() == 0:
                with open(_state_meta_path(state_path), "w") as f:
                    json.dump({"steps_per_epoch": steps_per_epoch,
                               "acc_max": acc_max, "epoch": epoch}, f)
    logger.close()
    return state, acc_data
