"""Model zoo registry.

Names mirror the reference drivers' ``--net`` values
(cifar100_train_eval.py:112-134, imgnet_train_eval.py:92-114), keyed by
dataset:

cifar:  mobilenet, mobilenet_swish, shufflenetv2, shufflenetv2_swish,
        vgg16, vgg16_gelu
imgnet: mobilenetv1, resnet, alexnet, squeezenet, inceptionv3
"""

from __future__ import annotations

from typing import Any, Optional

from cnns_slfp_quantization_tpu import calib


def create_model(
    name: str,
    qbit: int = 32,
    *,
    capture: Optional[str] = None,
    compute_dtype: Optional[Any] = None,
    scales: Optional[calib.ScaleSet] = None,
    num_classes: Optional[int] = None,
    frozen_weights: bool = False,
    use_pallas: Optional[bool] = None,
    ratio: float = 1,
):
    """Build a model by reference driver name (see module docstring)."""
    from cnns_slfp_quantization_tpu.models import mobilenetv1

    if ratio != 1 and name.split("/")[-1] not in (
            "shufflenetv2", "shufflenetv2_swish"):
        # only ShuffleNetV2 has width plans (reference shufflenet_v2.py:118-127);
        # silently ignoring --ratio for other nets would misreport the model
        raise ValueError(
            f"ratio={ratio} is only supported by shufflenetv2 (got {name!r})")

    common = dict(qbit=qbit, capture=capture, compute_dtype=compute_dtype)
    if name not in ("inceptionv3", "imgnet/inceptionv3"):
        common["frozen_weights"] = frozen_weights
        common["use_pallas"] = use_pallas

    if name in ("mobilenet", "cifar/mobilenet"):
        return mobilenetv1.MobileNetV1(
            scales=scales or calib.load_scales("mobilenetv1_cifar"),
            num_classes=num_classes or 100, **common,
        )
    if name in ("mobilenet_swish", "cifar/mobilenet_swish"):
        return mobilenetv1.MobileNetV1(
            scales=scales or calib.load_scales("mobilenetv1_swish_cifar"),
            num_classes=num_classes or 100, swish_tail=4, layerout_quant=True,
            **common,
        )
    if name in ("mobilenetv1", "imgnet/mobilenetv1"):
        return mobilenetv1.MobileNetV1(
            scales=scales or calib.load_scales("mobilenetv1_imgnet"),
            num_classes=num_classes or 1000, quant_classifier=False, **common,
        )
    if name in ("shufflenetv2", "shufflenetv2_swish", "cifar/shufflenetv2",
                "cifar/shufflenetv2_swish"):
        from cnns_slfp_quantization_tpu.models import shufflenetv2

        # Both driver names build the ReLU architecture; they differ only in
        # which checkpoint is loaded (cifar100_train_eval.py:112-118).
        # ``ratio`` selects the 0.5/1/1.5/2x width plan
        # (reference shufflenet_v2.py:118-127).
        return shufflenetv2.ShuffleNetV2(
            scales=scales or calib.load_scales("shufflenetv2_cifar"),
            num_classes=num_classes or 100, ratio=ratio, **common,
        )
    if name in ("vgg16", "cifar/vgg16"):
        from cnns_slfp_quantization_tpu.models import vgg16

        return vgg16.VGG16(
            scales=scales or calib.load_scales("vgg16_cifar"),
            num_classes=num_classes or 100, **common,
        )
    if name in ("vgg16_gelu", "cifar/vgg16_gelu"):
        from cnns_slfp_quantization_tpu.models import vgg16

        return vgg16.VGG16(
            scales=scales or calib.load_scales("vgg16_gelu_cifar"),
            num_classes=num_classes or 100, gelu_variant=True, **common,
        )
    if name in ("resnet", "resnet50", "imgnet/resnet"):
        from cnns_slfp_quantization_tpu.models import resnet50

        return resnet50.ResNet50(
            scales=scales or calib.load_scales("resnet50_imgnet"),
            num_classes=num_classes or 1000, **common,
        )
    if name in ("resnet_stl", "resnet_swish", "imgnet/resnet_stl",
                "imgnet/resnet_swish"):
        # activation-optimized variants (BASELINE config 4): SFP<4,4>
        # layerout quant + STL/Swish, the CIFAR-net recipe applied to
        # ResNet-50 (an extension — the reference has no such imgnet variant).
        # Each variant ships its own calibration constants (swapping ReLU for
        # STL/Swish changes every layer-input distribution; the reference's
        # Swish variant likewise ships distinct ka/kw,
        # nets_cifar/mobilenetv1.py:180-186 vs :14-19) — regenerable via
        # tools/calibrate_act_variants.py.
        from cnns_slfp_quantization_tpu.models import resnet50

        act = "stl" if name.endswith("stl") else "swish"
        if scales is None:
            import warnings

            try:
                scales = calib.load_scales(f"resnet50_{act}_imgnet")
            except FileNotFoundError:
                # swapping ReLU for STL/Swish changes every layer-input
                # distribution; reusing the ReLU Ka silently is the stale-Ka
                # bug — make the fallback loud.
                warnings.warn(
                    f"calibration constants resnet50_{act}_imgnet.json not "
                    f"found; falling back to the ReLU-calibrated "
                    f"resnet50_imgnet constants, which are WRONG for the "
                    f"{act} variant — recalibrate with "
                    f"tools/calibrate_act_variants.py", stacklevel=2)
                scales = calib.load_scales("resnet50_imgnet")
            if qbit < 32 and "synthetic" in scales.source:
                warnings.warn(
                    f"{name}: shipped default constants are calibrated from "
                    f"a synthetic-data model ({scales.source!r}); for real "
                    f"checkpoints recalibrate via --pre_reference before "
                    f"quantized inference", stacklevel=2)
        return resnet50.ResNet50(
            scales=scales, num_classes=num_classes or 1000,
            act=act, layerout_quant=True, **common,
        )
    if name in ("alexnet", "imgnet/alexnet"):
        from cnns_slfp_quantization_tpu.models import alexnet

        return alexnet.AlexNet(
            scales=scales or calib.load_scales("alexnet_imgnet"),
            num_classes=num_classes or 1000, **common,
        )
    if name in ("squeezenet", "imgnet/squeezenet"):
        from cnns_slfp_quantization_tpu.models import squeezenet

        return squeezenet.SqueezeNet(
            scales=scales or calib.load_scales("squeezenet_imgnet"),
            num_classes=num_classes or 1000, **common,
        )
    if name in ("inceptionv3", "imgnet/inceptionv3"):
        from cnns_slfp_quantization_tpu.models import inception_v3

        return inception_v3.InceptionV3(num_classes=num_classes or 1000)
    raise ValueError(f"unknown model {name!r}")


MODEL_NAMES = {
    "cifar": ["mobilenet", "mobilenet_swish", "shufflenetv2", "shufflenetv2_swish",
              "vgg16", "vgg16_gelu"],
    "imgnet": ["mobilenetv1", "resnet", "alexnet", "squeezenet", "inceptionv3"],
}

INPUT_SIZE = {"cifar": 32, "imgnet": 224}
