"""ResNet-50 v1.5 for ImageNet-1k (reference: nets_imgnet/resnet50.py).

54 quantized layers: stem conv (scale index 0), 16 bottlenecks (3 convs
each) + 4 quantized downsample convs, quantized final FC (index 53).
Scale-index layout (reference :142-145, :166-213):

  stage bases: layer1=1, layer2=11, layer3=24, layer4=43; within a stage the
  downsample conv is at ``base``, block ``b``'s conv1..3 at ``base+3b+1..+3``.

Bottleneck order (reference :71-90): conv1x1 -> BN -> ReLU -> conv3x3(stride)
-> BN -> ReLU -> conv1x1 -> BN -> (+downsample(x)) -> ReLU (v1.5: stride on
the 3x3).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cnns_slfp_quantization_tpu.calib import ScaleSet
from cnns_slfp_quantization_tpu.ops import activations as act_lib
from cnns_slfp_quantization_tpu.ops.layers import (
    LayeroutQuant,
    QuantConv,
    QuantDense,
)

_STAGES = [  # (planes, blocks, stride, scale_base)
    (64, 3, 1, 1),
    (128, 4, 2, 11),
    (256, 6, 2, 24),
    (512, 3, 2, 43),
]
_EXPANSION = 4


class ResNet50(nn.Module):
    scales: ScaleSet
    num_classes: int = 1000
    qbit: int = 32
    capture: Optional[str] = None
    compute_dtype: Optional[Any] = None
    frozen_weights: bool = False
    use_pallas: "bool | None" = None
    # Activation-optimized variant (BASELINE config 4): the reference applies
    # its activation optimization (SFP<4,4> layerout quant + a smooth
    # activation) only to CIFAR nets (nets_cifar/mobilenetv1.py:196-208,
    # vgg16.py:204-296); this extends the same recipe to ResNet-50.
    act: str = "relu"            # "relu" | "swish" | "stl" | "gelu"
    layerout_quant: bool = False  # SFP<4,4> quantize before each activation

    def _conv(self, sid, features, kernel, stride=1, pad=0, name="",
              nonneg=True):
        # every conv input except the stem's (the signed normalized image) is
        # post-ReLU/maxpool, so the quantizer can skip sign handling
        return QuantConv(
            features=features, kernel_size=(kernel, kernel), qbit=self.qbit,
            ka=float(self.scales.ka[sid]), kw=float(self.scales.kw[sid]),
            strides=(stride, stride), padding=pad, use_bias=False,
            capture=self.capture, compute_dtype=self.compute_dtype,
            frozen_weights=self.frozen_weights, use_pallas=self.use_pallas,
            nonneg_input=nonneg, layer_id=sid, name=name,
        )

    def _bn(self, name):
        return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.compute_dtype, name=name)

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        ura = not train
        act_fn = act_lib.get(self.act)

        def act(x, name):
            if self.layerout_quant:
                x = LayeroutQuant(qbit=self.qbit, name=name)(x)
            return act_fn(x)

        x = self._conv(0, 64, 7, 2, pad=3, name="conv1", nonneg=False)(x)
        x = self._bn("bn1")(x, use_running_average=ura)
        x = act(x, "loq1")
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # smooth activations emit signed values: quantizers keep sign ops
        nonneg = self.act == "relu"
        in_ch = 64
        for s, (planes, blocks, stride, base) in enumerate(_STAGES):
            out_ch = planes * _EXPANSION
            for b in range(blocks):
                bstride = stride if b == 0 else 1
                pre = f"layer{s + 1}_{b}"
                identity = x
                sid = base + 3 * b
                y = self._conv(sid + 1, planes, 1, name=f"{pre}_conv1",
                               nonneg=nonneg)(x)
                y = self._bn(f"{pre}_bn1")(y, use_running_average=ura)
                y = act(y, f"{pre}_loq1")
                y = self._conv(sid + 2, planes, 3, bstride, pad=1,
                               name=f"{pre}_conv2", nonneg=nonneg)(y)
                y = self._bn(f"{pre}_bn2")(y, use_running_average=ura)
                y = act(y, f"{pre}_loq2")
                y = self._conv(sid + 3, out_ch, 1, name=f"{pre}_conv3",
                               nonneg=nonneg)(y)
                y = self._bn(f"{pre}_bn3")(y, use_running_average=ura)
                if b == 0 and (bstride != 1 or in_ch != out_ch):
                    identity = self._conv(base, out_ch, 1, bstride,
                                          name=f"{pre}_down_conv",
                                          nonneg=nonneg)(x)
                    identity = self._bn(f"{pre}_down_bn")(
                        identity, use_running_average=ura)
                x = act(y + identity, f"{pre}_loq3")
            in_ch = out_ch

        x = jnp.mean(x, axis=(1, 2))
        x = QuantDense(
            features=self.num_classes, qbit=self.qbit,
            ka=float(self.scales.ka[53]), kw=float(self.scales.kw[53]),
            capture=self.capture, compute_dtype=self.compute_dtype,
            frozen_weights=self.frozen_weights, use_pallas=self.use_pallas,
            nonneg_input=nonneg, layer_id=53, name="fc",
        )(x)
        return x
