"""MobileNetV1 (CIFAR-100 and ImageNet-1k variants).

Reference: nets_cifar/mobilenetv1.py (MobileNetV1_Q :10, MobileNetV1_swish
:176) and nets_imgnet/mobilenetv1.py (MobileNetV1_Q :11).

Architecture: first 3x3 stride-2 conv + 13 depthwise-separable blocks
(dw 3x3 + pw 1x1), global average pool, classifier.  Per-layer scale
constants are threaded by global conv index: conv 0 is the stem, block b
uses indices 1+2b (dw) and 2+2b (pw), the classifier is index 27
(reference slicing at nets_cifar/mobilenetv1.py:47-64).

Variants:
- cifar "relu" (MobileNetV1_Q): BN + ReLU, quantized final Linear.
- cifar "swish" (MobileNetV1_swish): BN + SFP<4,4> layerout-quant + act on
  every block; the last 4 blocks (model[10..13], reference :243-246) use
  Swish, the rest ReLU.
- imgnet (nets_imgnet/mobilenetv1.py): BN + ReLU, 1000 classes,
  *unquantized* final Linear (reference :61).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cnns_slfp_quantization_tpu.calib import ScaleSet
from cnns_slfp_quantization_tpu.ops import activations as act_lib
from cnns_slfp_quantization_tpu.ops.layers import LayeroutQuant, QuantConv, QuantDense

# (in, out, stride) of the 13 depthwise-separable blocks
_DW_CONFIG = [
    (32, 64, 1), (64, 128, 2), (128, 128, 1), (128, 256, 2), (256, 256, 1),
    (256, 512, 2), (512, 512, 1), (512, 512, 1), (512, 512, 1), (512, 512, 1),
    (512, 512, 1), (512, 1024, 2), (1024, 1024, 1),
]


class MobileNetV1(nn.Module):
    scales: ScaleSet
    num_classes: int = 100
    qbit: int = 32
    swish_tail: int = 0          # trailing dw-blocks using Swish (4 for _swish)
    layerout_quant: bool = False  # SFP<4,4> after every BN (swish variant)
    quant_classifier: bool = True
    capture: Optional[str] = None
    compute_dtype: Optional[Any] = None
    frozen_weights: bool = False
    use_pallas: "bool | None" = None

    def _conv(self, i, features, kernel, stride, groups=1, pad=1,
              nonneg=False):
        return QuantConv(
            features=features, kernel_size=(kernel, kernel), qbit=self.qbit,
            ka=float(self.scales.ka[i]), kw=float(self.scales.kw[i]),
            strides=(stride, stride), padding=pad, feature_group_count=groups,
            use_bias=False, capture=self.capture, compute_dtype=self.compute_dtype,
            frozen_weights=self.frozen_weights, use_pallas=self.use_pallas,
            nonneg_input=nonneg, layer_id=i, name=f"conv{i}",
        )

    def _bn(self, i):
        return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.compute_dtype, name=f"bn{i}")

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        def post(i, x, act):
            x = self._bn(i)(x, use_running_average=not train)
            if self.layerout_quant:
                x = LayeroutQuant(qbit=self.qbit, name=f"loq{i}")(x)
            return act(x)

        x = self._conv(0, 32, 3, 2)(x)
        x = post(0, x, act_lib.relu)

        prev_relu = True  # Swish outputs are signed; track nonneg-ness
        for b, (inp, oup, stride) in enumerate(_DW_CONFIG):
            is_relu = b < len(_DW_CONFIG) - self.swish_tail
            act = act_lib.relu if is_relu else act_lib.swish
            i_dw, i_pw = 1 + 2 * b, 2 + 2 * b
            x = self._conv(i_dw, inp, 3, stride, groups=inp,
                           nonneg=prev_relu)(x)
            x = post(i_dw, x, act)
            x = self._conv(i_pw, oup, 1, 1, pad=0, nonneg=is_relu)(x)
            x = post(i_pw, x, act)
            prev_relu = is_relu

        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1) / AvgPool2d(7)
        if self.quant_classifier:
            x = QuantDense(
                features=self.num_classes, qbit=self.qbit,
                ka=float(self.scales.ka[27]), kw=float(self.scales.kw[27]),
                capture=self.capture, compute_dtype=self.compute_dtype,
                frozen_weights=self.frozen_weights, use_pallas=self.use_pallas,
                nonneg_input=prev_relu, layer_id=27, name="fc",
            )(x)
        else:
            x = nn.Dense(self.num_classes, name="fc")(x)
        return x
