"""Data-parallel scaling benchmark: images/sec at 1..N devices.

The north-star scaling run (BASELINE.json: >=90% linear images/sec from
1 chip to N hosts): shard the batch over a growing 'data' mesh with
TP-sharded weights and measure sharded throughput per device count — both
**inference** and **QAT training** (full fwd + bwd + DSGD step; gradient
psum over 'data' inserted by GSPMD).  On real hardware this measures ICI
scaling; under ``--xla_force_host_platform_device_count=N`` it validates the
mechanism and the collective layout without chips.

    python -m cnns_slfp_quantization_tpu.parallel.scaling_bench \
        --net mobilenet --devices 1 2 4 8 --per_device_batch 32 --mode both
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from cnns_slfp_quantization_tpu import models
from cnns_slfp_quantization_tpu.parallel import make_mesh, steps
from cnns_slfp_quantization_tpu.train import loop, optimizers
from cnns_slfp_quantization_tpu.utils.profiling import (
    scan_throughput, scan_train_throughput)


def _fused_model_and_vars(net, variables, sample):
    """Frozen variables + fused executor for the serving fast path."""
    from cnns_slfp_quantization_tpu import calib, models as models_lib
    from cnns_slfp_quantization_tpu.ops import freeze

    cap = models_lib.create_model(net, 8, capture="full")
    vf = freeze.prequantize_variables(cap, variables, sample,
                                      dtype=jnp.bfloat16)
    if net in ("resnet", "resnet50", "imgnet/resnet"):
        from cnns_slfp_quantization_tpu.models import resnet50_fused

        return resnet50_fused.as_model(
            calib.load_scales("resnet50_imgnet")), vf
    from cnns_slfp_quantization_tpu.models import mobilenetv1_fused

    cifar = net in ("mobilenet", "cifar/mobilenet")
    return mobilenetv1_fused.as_model(
        calib.load_scales("mobilenetv1_cifar" if cifar
                          else "mobilenetv1_imgnet"),
        quant_classifier=cifar), vf


def _infer_ips(net, qbit, mesh, x, fused):
    model = models.create_model(net, qbit)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    if fused:
        model, variables = _fused_model_and_vars(net, variables, x[:1])
    with mesh:
        # model axis > 1: TP-shard the weights (out-channel PartitionSpec
        # policy); model axis == 1: replicate.  The batch shards over
        # 'data'; GSPMD inserts any boundary collectives.
        variables = jax.device_put(
            variables, steps.mesh_lib.param_shardings(variables, mesh))
        xs = jax.device_put(x, steps.mesh_lib.batch_sharding(mesh, x.ndim))
        return scan_throughput(model, variables, xs, steps=8)


def _train_ips(net, qbit, mesh, x, optimizer="DSGD"):
    """Sharded QAT step throughput: fwd + bwd + quantize-aware optimizer.
    Gradients of replicated/TP-sharded params are psum'd over 'data' by
    XLA-inserted collectives, overlapped by the latency-hiding scheduler."""
    model = models.create_model(net, qbit)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    tx = optimizers.create_optimizer(optimizer, 1e-3, qbit)
    state = loop.TrainState.create(variables, tx)
    y = jnp.zeros((x.shape[0],), jnp.int32)
    with mesh:
        state = steps.shard_state(state, mesh)
        xs, ys = steps.place_batch(mesh, x, y)
        train_step = steps.jit_train_step(loop.make_train_step(model, tx),
                                          donate=False)
        return scan_train_throughput(train_step, state, xs, ys, steps=4)


def run(net: str, device_counts, per_device_batch: int, image_size: int,
        qbit: int = 8, model_axis: int = 1, fused: bool = False,
        mode: str = "infer"):
    results = {}
    for n in device_counts:
        if n > len(jax.devices()):
            break
        mesh = make_mesh(data=n // model_axis, model=model_axis,
                         devices=jax.devices()[:n])
        batch = per_device_batch * (n // model_axis)
        x = jax.random.normal(jax.random.PRNGKey(0),
                              (batch, image_size, image_size, 3))
        row = {}
        if mode in ("infer", "both"):
            row["infer"] = _infer_ips(net, qbit, mesh, x, fused)
        if mode in ("train", "both"):
            row["train"] = _train_ips(net, qbit, mesh, x)
        results[n] = row
    report = []
    n0 = device_counts[0]
    for kind in ("infer", "train"):
        base = results.get(n0, {}).get(kind)
        if base is None:
            continue
        for n, row in results.items():
            ips = row[kind]
            eff = ips / (base * n / n0) if base else float("nan")
            report.append({"mode": kind, "devices": n,
                           "images_per_sec": round(ips, 1),
                           "scaling_efficiency": round(eff, 3)})
    return report


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--net", default="mobilenet")
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--per_device_batch", type=int, default=32)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--Qbits", type=int, default=8)
    p.add_argument("--model_axis", type=int, default=1)
    p.add_argument("--mode", choices=["infer", "train", "both"],
                   default="both")
    p.add_argument("--fused", action="store_true", default=False,
                   help="use the fused serving executor (resnet/mobilenet)")
    cfg = p.parse_args(argv)
    for row in run(cfg.net, cfg.devices, cfg.per_device_batch,
                   cfg.image_size, cfg.Qbits, cfg.model_axis,
                   fused=cfg.fused, mode=cfg.mode):
        print(json.dumps(row))


if __name__ == "__main__":
    main()
