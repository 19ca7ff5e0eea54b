"""6%-subset fine-tune recovery demo (reference README.md:12).

The reference's second headline: after PTQ, fine-tuning on ~6% of the train
set restores the lost accuracy.  The reference realizes this operationally
(run ``--retrain`` briefly at lr=1e-4, SURVEY.md §5 — it ships no sampler);
here the workflow is demonstrated end-to-end on the deterministic synthetic
dataset (zero-egress environment):

1. train fp32 on a FIXED train set (reference cifar100_train_eval.py
   train() loop semantics),
2. calibrate on held-out images (--pre_reference workflow, :213-301) and
   measure the SLFP PTQ top-1 drop,
3. fine-tune the quantized model with DSGD (the paper's quantization-aware
   SGD, utils/optimizer.py:9) on a class-stratified 6% subset
   (data/subset.py, ``--train_subset 0.06``),
4. re-evaluate: drop -> recovered.

Run (TPU): python -m cnns_slfp_quantization_tpu.cli.recovery
Results table: docs/ACCURACY.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from cnns_slfp_quantization_tpu import models
from cnns_slfp_quantization_tpu.cli.ptq_accuracy import (
    DEFAULT_LR, NETS, calibrate_trained, gen_eval_sets, task_params)
from cnns_slfp_quantization_tpu.data import subset as subset_lib
from cnns_slfp_quantization_tpu.data import synthetic
from cnns_slfp_quantization_tpu.train import loop, optimizers


def _task(net: str) -> dict:
    """Synthetic-task config: harness nets use their tuned TASK entry; the
    act-variant ResNets (our extension — no torch oracle exists, so they
    never enter ptq_accuracy.NETS) reuse the resnet task (64px, same
    difficulty)."""
    if net in NETS:
        return task_params(net)
    if net in ("resnet_stl", "resnet_swish"):
        t = dict(task_params("resnet"))
        t["has_dropout"] = False
        return t
    raise ValueError(
        f"unknown net {net!r}: recovery supports {sorted(NETS)} plus "
        f"resnet_stl / resnet_swish")


def _train_arrays(n_images, batch, task, seed=0):
    it = synthetic.SyntheticIterator(
        image_size=task["size"], num_classes=task["classes"],
        batch_size=batch, num_batches=math.ceil(n_images / batch), seed=seed,
        signal=task["signal"], proto_res=task["proto_res"],
        signal_jitter=task["signal_jitter"])
    xs, ys = zip(*list(it))
    return (np.concatenate(xs)[:n_images], np.concatenate(ys)[:n_images])


def _epochs(model, variables, tx, images, labels, batch, epochs, seed,
            has_batch_stats=True):
    if len(images) < batch:
        raise ValueError(
            f"need at least one full batch: {len(images)} images < "
            f"batch {batch} (raise --train_images or lower --batch)")
    state = loop.TrainState.create(variables, tx)
    step = jax.jit(loop.make_train_step(model, tx), donate_argnums=0)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    for e in range(epochs):
        order = rng.permutation(len(images))
        metrics = None
        for i in range(0, len(images) - batch + 1, batch):
            idx = order[i:i + batch]
            key, sub = jax.random.split(key)
            state, metrics = step(state, jnp.asarray(images[idx]),
                                  jnp.asarray(labels[idx]), sub)
        m = jax.device_get(metrics)
        print(f"  epoch {e}: loss={float(m['loss']):.3f} "
              f"acc={float(m['accuracy']):.3f}", flush=True)
    return state


def _evaluate(model, variables, images, labels, batch):
    es = jax.jit(loop.make_eval_step(model))
    batches = [(jnp.asarray(images[i:i + batch]),
                jnp.asarray(labels[i:i + batch]))
               for i in range(0, len(images) - batch + 1, batch)]
    return loop.evaluate(es, variables, batches)["top1"]


def run(net="mobilenet", qbit=8, fp32_epochs=4, train_images=12800,
        batch=128, subset_fraction=0.06, qat_epochs=10, qat_lr=1e-4,
        eval_images=2000, seed=0):
    task = _task(net)
    tr_x, tr_y = _train_arrays(train_images, batch, task, seed=seed)
    ev_x, ev_y, cal_x = gen_eval_sets(net, eval_images, 64, seed, task=task)

    # 1. fp32 baseline training
    import optax

    model32 = models.create_model(net, 32, num_classes=task["classes"])
    variables = model32.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, task["size"], task["size"], 3)), train=False)
    lr32 = DEFAULT_LR.get(net, DEFAULT_LR.get(net.split("_")[0], 0.05))
    tx32 = optax.chain(optax.add_decayed_weights(5e-4),
                       optax.sgd(lr32, momentum=0.9))
    print(f"[{net}] fp32 training ({fp32_epochs} epochs x "
          f"{train_images} images, lr={lr32})", flush=True)
    st32 = _epochs(model32, variables, tx32, tr_x, tr_y, batch, fp32_epochs,
                   seed)
    v32_raw = jax.device_get(st32.variables())

    def graft(init_node, new_node):
        if isinstance(init_node, dict):
            return {k: graft(v, new_node[k]) for k, v in init_node.items()}
        return np.asarray(new_node)

    v32 = graft(variables, v32_raw)
    acc_fp32 = _evaluate(model32, v32, ev_x, ev_y, 64)

    # 2. calibrate + PTQ eval
    qs = calibrate_trained(net, v32, cal_x, 64, num_classes=task["classes"])
    modelq = models.create_model(net, qbit, scales=qs,
                                 num_classes=task["classes"])
    acc_ptq = _evaluate(modelq, v32, ev_x, ev_y, 64)

    # 3. DSGD fine-tune on the stratified 6% subset (reference lr default
    #    1e-4, cifar100_train_eval.py:62)
    idx = subset_lib.stratified_indices(tr_y, subset_fraction, seed=seed)
    sub_x, sub_y = tr_x[idx], tr_y[idx]
    sub_batch = min(batch, max(32, len(idx) // 6))
    print(f"[{net}] DSGD fine-tune on {len(idx)} images "
          f"({100 * subset_fraction:.0f}% subset, {qat_epochs} epochs)",
          flush=True)
    txq = optimizers.create_optimizer("DSGD", qat_lr, qbit, weight_decay=5e-4)
    stq = _epochs(modelq, v32, txq, sub_x, sub_y, sub_batch, qat_epochs,
                  seed + 1)
    vq = graft(variables, jax.device_get(stq.variables()))
    acc_rec = _evaluate(modelq, vq, ev_x, ev_y, 64)

    row = {
        "net": net, "qbit": qbit, "train_images": train_images,
        "subset_images": int(len(idx)),
        "subset_fraction": subset_fraction, "qat_epochs": qat_epochs,
        "acc_fp32": round(acc_fp32, 2), "acc_ptq": round(acc_ptq, 2),
        "ptq_drop": round(acc_fp32 - acc_ptq, 2),
        "acc_recovered": round(acc_rec, 2),
        "recovered_delta": round(acc_rec - acc_ptq, 2),
        "vs_fp32_after_recovery": round(acc_rec - acc_fp32, 2),
    }
    print(json.dumps(row), flush=True)
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--net", default="mobilenet")
    p.add_argument("--qbits", type=int, nargs="+", default=[8, 7])
    p.add_argument("--fp32_epochs", type=int, default=4)
    p.add_argument("--train_images", type=int, default=12800)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--subset", type=float, default=0.06)
    p.add_argument("--qat_epochs", type=int, default=10)
    p.add_argument("--qat_lr", type=float, default=1e-4)
    p.add_argument("--eval_images", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--jax_cache", type=str, default="/tmp/jax_cache")
    cfg = p.parse_args(argv)
    if cfg.jax_cache:
        os.makedirs(cfg.jax_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cfg.jax_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return [run(cfg.net, q, cfg.fp32_epochs, cfg.train_images, cfg.batch,
                cfg.subset, cfg.qat_epochs, cfg.qat_lr, cfg.eval_images,
                cfg.seed)
            for q in cfg.qbits]


if __name__ == "__main__":
    main()
