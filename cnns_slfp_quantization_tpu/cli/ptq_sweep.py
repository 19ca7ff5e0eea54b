"""PTQ bit-width sweep: evaluate a net at FP32 / SLFP8 / SFP7 in one run.

The BASELINE.json config-3 workflow ("AlexNet + SqueezeNet1.0 on ImageNet-1k,
SLFP8 and SFP7 PTQ sweep"): load one set of weights, evaluate top-1/top-5 at
each bit width, report the deltas vs FP32 (the reference's <1% PTQ-loss
claim, README.md:11).

    python -m cnns_slfp_quantization_tpu.cli.ptq_sweep \
        --net alexnet --dataset imgnet --pretrain_dir ckpt/alexnet.pth
"""

from __future__ import annotations

import argparse
import json
import os

import jax

from cnns_slfp_quantization_tpu import models
from cnns_slfp_quantization_tpu.cli import common
from cnns_slfp_quantization_tpu.data import synthetic
from cnns_slfp_quantization_tpu.train import loop


def main(argv=None):
    p = argparse.ArgumentParser()
    common.add_common_args(p)
    p.add_argument("--net", type=str, default="alexnet")
    p.add_argument("--dataset", choices=["cifar", "imgnet"], default="imgnet")
    p.add_argument("--qbits", type=int, nargs="+", default=[32, 8, 7])
    p.add_argument("--eval_batch_size", type=int, default=32)
    p.add_argument("--max_images", type=int, default=None)
    cfg = p.parse_args(argv)
    common.configure_runtime(cfg)

    size = models.INPUT_SIZE[cfg.dataset]
    classes = 100 if cfg.dataset == "cifar" else 1000

    def batches():
        if cfg.synthetic or cfg.dataset == "imgnet" and not os.path.isdir(
                os.path.join(cfg.data_dir, "val")):
            return synthetic.SyntheticIterator(
                image_size=size, num_classes=classes,
                batch_size=cfg.eval_batch_size, num_batches=8, seed=1)
        if cfg.dataset == "cifar":
            from cnns_slfp_quantization_tpu.data import cifar as cifar_data

            _, ev = cifar_data.make_iterators(
                cfg.data_dir, classes, cfg.eval_batch_size,
                cfg.eval_batch_size)
            return ev
        from cnns_slfp_quantization_tpu.data import imagenet

        return imagenet.ImageNetIterator(
            os.path.join(cfg.data_dir, "val"), cfg.eval_batch_size,
            train=False, workers=cfg.num_workers)

    # one weight set shared across bit widths (PTQ: quantize-the-frozen-net)
    base_cfg = argparse.Namespace(**vars(cfg), Qbits_override=None)
    base_cfg.Qbits = 32
    _, variables = common.build_model(base_cfg, cfg.net, size)
    if cfg.pretrain or cfg.pretrain_dir:
        variables = common.load_pretrained(cfg, variables)

    results = {}
    for qbit in cfg.qbits:
        q_cfg = argparse.Namespace(**vars(cfg))
        q_cfg.Qbits = qbit
        model, _ = common.build_model(q_cfg, cfg.net, size)
        eval_step = jax.jit(loop.make_eval_step(model))
        metrics = loop.evaluate(eval_step, variables, batches(),
                                max_images=cfg.max_images)
        results[qbit] = metrics
        print(f"Qbits={qbit}: top1={metrics['top1']:.2f}% "
              f"top5={metrics['top5']:.2f}% ({metrics['images']} images)")

    if 32 in results:
        for qbit in cfg.qbits:
            if qbit != 32:
                d1 = results[32]["top1"] - results[qbit]["top1"]
                print(f"PTQ top-1 loss @ Qbits={qbit}: {d1:+.2f}%")
    print(json.dumps({str(k): v for k, v in results.items()}))


if __name__ == "__main__":
    main()
