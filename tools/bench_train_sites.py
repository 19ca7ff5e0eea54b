"""Attribute the DSGD SLFP8 QAT training step cost site by site.

Training-side analog of tools/bench_quant_sites.py: the reference's QAT step
quantizes (a) every layer input (conv2d_func.py:21), (b) every weight
(conv2d_func.py:22), and (c) every parameter TWICE in the optimizer
(utils/optimizer.py:58-64: Q(p) and Q(p + delta1)).  This tool measures what
each class costs on the TPU by swapping in cost-isolating variants with
identical shapes (numerics deliberately differ — diagnosis only):

  prod       qbit-8 model, production DSGD                      (baseline)
  opt_noq    DSGD whose rescale skips both quantize() calls     (c) cost
  opt_sgd    plain momentum SGD (no rescale logic at all)       (c)+where
  fwd_nowq   frozen_weights=True (weights pre-quantized offline,
             per-step weight quantize removed)                  (b) cost
  fwd_none   qbit-32 model (no forward quantizes), DSGD q8      (a)+(b) cost

Reuse question (VERDICT r4 #5): the forward computes Q(w/Kw), DSGD needs
Q(p) — SLFP quantization is NOT scale-equivariant (Q(p/Kw)*Kw != Q(p)
except for pow2 Kw), so the optimizer cannot reuse the forward's quantized
weights bit-exactly; the measured (c) bound decides whether a lossy reuse
would even be worth pursuing.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train_sites.py
Results: docs/DESIGN.md round-5 QAT attribution table.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import optax

from cnns_slfp_quantization_tpu import models
from cnns_slfp_quantization_tpu.ops import freeze
from cnns_slfp_quantization_tpu.train import loop, optimizers
from cnns_slfp_quantization_tpu.utils.profiling import scan_train_throughput


def _dsgd_noq(lr, tol=1e-4):
    """DSGD control-flow preserved, quantize() calls removed (same where/
    select structure against the raw weight)."""

    def rescale(p, delta1, quantize):
        del quantize
        return jnp.where(jnp.abs(delta1) < tol, 2.0, 0.0)

    return optimizers._qsgd(lr, 8, 0.9, 0.0, 5e-4, False, rescale)


def measure(name, qbit, *, batch, size, n_classes, tx, frozen=False,
            steps=8):
    model = models.create_model(name, qbit, compute_dtype=jnp.bfloat16,
                                frozen_weights=frozen)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, size, size, 3),
                          jnp.float32)
    y = jax.random.randint(jax.random.PRNGKey(1), (batch,), 0, n_classes)
    init_model = models.create_model(name, qbit, compute_dtype=jnp.bfloat16)
    variables = init_model.init(jax.random.PRNGKey(2), x[:1], train=False)
    if frozen:
        cap = models.create_model(name, qbit, capture="full")
        variables = freeze.prequantize_variables(cap, variables, x[:1])
    state = loop.TrainState.create(variables, tx)
    step = loop.make_train_step(model, tx, False)
    return round(scan_train_throughput(step, state, x, y, steps=steps), 1)


def run_net(name, *, batch, size, n_classes):
    lr = 0.01
    rows = {}
    rows["prod"] = measure(name, 8, batch=batch, size=size,
                           n_classes=n_classes, tx=optimizers.dsgd(lr, 8))
    rows["opt_noq"] = measure(name, 8, batch=batch, size=size,
                              n_classes=n_classes, tx=_dsgd_noq(lr))
    rows["opt_sgd"] = measure(name, 8, batch=batch, size=size,
                              n_classes=n_classes, tx=optimizers.sgd(lr))
    rows["fwd_nowq"] = measure(name, 8, batch=batch, size=size,
                               n_classes=n_classes,
                               tx=optimizers.dsgd(lr, 8), frozen=True)
    rows["fwd_none"] = measure(name, 32, batch=batch, size=size,
                               n_classes=n_classes, tx=optimizers.dsgd(lr, 8))

    def ms(v):
        return batch / v * 1e3

    out = {
        "net": name, "batch": batch, "img_per_sec": rows,
        "step_ms": {k: round(ms(v), 2) for k, v in rows.items()},
        "cost_ms": {
            "optimizer_2x_quantize": round(ms(rows["prod"])
                                           - ms(rows["opt_noq"]), 2),
            "fwd_weight_quantize": round(ms(rows["prod"])
                                         - ms(rows["fwd_nowq"]), 2),
            "fwd_act_quantize": round(ms(rows["fwd_nowq"])
                                      - ms(rows["fwd_none"]), 2),
        },
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nets", nargs="+", default=["resnet", "mobilenet"])
    p.add_argument("--jax_cache", type=str, default="/tmp/jax_cache")
    cfg = p.parse_args()
    if cfg.jax_cache:
        import os

        os.makedirs(cfg.jax_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cfg.jax_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for name in cfg.nets:
        if name == "resnet":
            run_net("resnet", batch=64, size=224, n_classes=1000)
        elif name == "mobilenet":
            run_net("mobilenet", batch=256, size=32, n_classes=100)
        else:
            raise SystemExit(f"unsupported net {name}")


if __name__ == "__main__":
    main()
