"""ImageNet-1k train/eval driver (reference: imgnet_train_eval.py).

    python -m cnns_slfp_quantization_tpu.cli.imgnet_train_eval \
        --Qbits 8 --net resnet --pretrain [--all_validate]

Nets: mobilenetv1, resnet, alexnet, squeezenet, inceptionv3
(imgnet_train_eval.py:92-114).  ``--all_validate`` switches between the
100-image smoke eval and the full 50k validation (:40, :182-185).
"""

from __future__ import annotations

import argparse
import os

from cnns_slfp_quantization_tpu import models
from cnns_slfp_quantization_tpu.cli import common
from cnns_slfp_quantization_tpu.data import synthetic


def make_parser():
    parser = argparse.ArgumentParser(
        description="SLFP train and finetune, TPU-native implementation")
    common.add_common_args(parser)
    parser.add_argument("--log_name", type=str, default="imgnet-1k")
    parser.add_argument("--net", type=str, default="mobilenetv1")
    parser.add_argument("--all_validate", action="store_true", default=False)
    parser.add_argument("--train_batch_size", type=int, default=32)
    parser.add_argument("--eval_batch_size", type=int, default=16)
    parser.add_argument("--max_epochs", type=int, default=2)
    parser.set_defaults(data_dir="/opt/datasets/imagenet-1k")
    return parser


def main(argv=None):
    cfg = make_parser().parse_args(argv)
    common.configure_runtime(cfg)
    log_dir = os.path.join(cfg.root_dir, "logs", cfg.log_name)
    ckpt_dir = os.path.join(cfg.root_dir, "ckpt", cfg.log_name)
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(ckpt_dir, exist_ok=True)

    if cfg.synthetic or not os.path.isdir(os.path.join(cfg.data_dir, "val")):
        print("==> using synthetic data")
        train_batches = synthetic.SyntheticIterator(
            image_size=224, num_classes=1000,
            batch_size=cfg.train_batch_size,
            num_batches=cfg.synthetic_batches or 10, seed=0)
        # enough eval batches to cover the 100-image smoke cap regardless of
        # --eval_batch_size (the cap in run_main_loop slices exactly to 100)
        eval_n = max(8, -(-120 // cfg.eval_batch_size))
        eval_batches = synthetic.SyntheticIterator(
            image_size=224, num_classes=1000,
            batch_size=cfg.eval_batch_size, num_batches=eval_n, seed=1)
    else:
        from cnns_slfp_quantization_tpu.data import imagenet

        train_batches = imagenet.ImageNetIterator(
            os.path.join(cfg.data_dir, "train"), cfg.train_batch_size,
            train=True, workers=cfg.num_workers,
            subset_fraction=cfg.train_subset)
        eval_batches = imagenet.ImageNetIterator(
            os.path.join(cfg.data_dir, "val"), cfg.eval_batch_size,
            train=False, workers=cfg.num_workers)

    print("=> creating model", cfg.net, "...")
    print(" learning rate = ", cfg.lr)
    model, variables = common.build_model(cfg, cfg.net, image_size=224)
    if cfg.pretrain:
        variables = common.load_pretrained(cfg, variables)

    if cfg.pre_reference:
        calib_model = models.create_model(cfg.net, cfg.Qbits, capture="absmax")
        common.run_calibration(cfg, calib_model, cfg.net, variables,
                               eval_batches)
        return

    # imgnet_train_eval.py:182-185: 100-image smoke eval unless --all_validate
    eval_max = None if cfg.all_validate else 100
    has_dropout = cfg.net in ("alexnet", "squeezenet", "inceptionv3")
    return common.run_main_loop(
        cfg, model, variables, train_batches, eval_batches,
        max_epochs=cfg.max_epochs, log_dir=log_dir,
        ckpt_path=os.path.join(ckpt_dir, f"{cfg.net}{cfg.num}_tmp"),
        steps_per_epoch=max(len(train_batches), 1),
        milestones=(10**9,),  # imgnet LR schedule commented out (:137)
        eval_max_images=eval_max,
        has_dropout=has_dropout,
    )


if __name__ == "__main__":
    main()
