"""Probe synthetic-task difficulty: fp32 top-1 vs signal amplitude per net.

Supports tuning cli/ptq_accuracy.TASK so every net's fp32 accuracy lands in
the informative 60-90% band (VERDICT r4: rows at >99% or <30% carry no
evidence).  Trains the fp32 model at each --signals value and reports
held-out top-1 — the train/eval graphs compile once per net (signal only
changes the data), so extra probe points are cheap.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/tune_task_signal.py \
         --net mobilenet --signals 0.08 0.12 0.16 0.24
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from cnns_slfp_quantization_tpu.cli import ptq_accuracy as pa
from cnns_slfp_quantization_tpu.train import loop


def probe(net, signal, *, train_steps, eval_images, proto_res, classes,
          lr, seed):
    task = pa.task_params(net, signal=signal, classes=classes,
                          proto_res=proto_res)
    model, variables = pa.train_our_model(
        net, train_steps=train_steps, batch_size=64,
        lr=lr if lr is not None else pa.DEFAULT_LR.get(net, 0.05),
        seed=seed, log_every=0, task=task)
    images, labels, _ = pa.gen_eval_sets(net, eval_images, 64, seed,
                                         task=task)
    fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    preds = []
    for i in range(0, len(images), 64):
        preds.append(np.argmax(np.asarray(
            fn(variables, jnp.asarray(images[i:i + 64]))), -1))
    acc = 100.0 * float(np.mean(np.concatenate(preds) == labels))
    print(json.dumps({"net": net, "signal": signal,
                      "classes": task["classes"],
                      "proto_res": task["proto_res"],
                      "train_steps": train_steps,
                      "fp32_top1": round(acc, 2)}), flush=True)
    return acc


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--net", required=True)
    p.add_argument("--signals", type=float, nargs="+", required=True)
    p.add_argument("--train_steps", type=int, default=300)
    p.add_argument("--eval_images", type=int, default=1000)
    p.add_argument("--proto_res", type=int, default=None)
    p.add_argument("--classes", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--jax_cache", type=str, default="/tmp/jax_cache")
    cfg = p.parse_args()
    if cfg.jax_cache:
        import os

        os.makedirs(cfg.jax_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cfg.jax_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for s in cfg.signals:
        probe(cfg.net, s, train_steps=cfg.train_steps,
              eval_images=cfg.eval_images, proto_res=cfg.proto_res,
              classes=cfg.classes, lr=cfg.lr, seed=cfg.seed)


if __name__ == "__main__":
    main()
