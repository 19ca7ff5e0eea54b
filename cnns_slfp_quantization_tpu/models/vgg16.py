"""VGG16 for CIFAR-100 (reference: nets_cifar/vgg16.py).

Two variants sharing one module:
- VGG16_Q (:14): *biased* quantized convs (conv2d_Q_bias), BN + ReLU, all
  three FC layers use scale index 13 (:99-108 — the reference threads Kw[13]
  into fc1/fc2/fc3 alike), dropout 0.5.
- VGG16_gelu (:186): unbiased quantized convs, BN + SFP<4,4> layerout-quant
  + GELU everywhere, FCs use indices 13/14/15, dropout 0.4.

Conv scale indices 0..12 in reading order; classifier head:
AdaptiveAvgPool(1) -> 512 -> 256 -> num_classes.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cnns_slfp_quantization_tpu.calib import ScaleSet
from cnns_slfp_quantization_tpu.ops import activations as act_lib
from cnns_slfp_quantization_tpu.ops.layers import LayeroutQuant, QuantConv, QuantDense

# conv plan: (features, layers-in-group) per VGG16-D
_GROUPS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


class VGG16(nn.Module):
    scales: ScaleSet
    num_classes: int = 100
    qbit: int = 32
    gelu_variant: bool = False
    capture: Optional[str] = None
    compute_dtype: Optional[Any] = None
    frozen_weights: bool = False
    use_pallas: "bool | None" = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        act = act_lib.gelu if self.gelu_variant else act_lib.relu
        drop_rate = 0.4 if self.gelu_variant else 0.5
        use_bias = not self.gelu_variant  # VGG16_Q uses conv2d_Q_bias (:24)

        i = 0
        for g, (feat, n) in enumerate(_GROUPS):
            for _ in range(n):
                x = QuantConv(
                    features=feat, kernel_size=(3, 3), qbit=self.qbit,
                    ka=float(self.scales.ka[i]), kw=float(self.scales.kw[i]),
                    padding=1, use_bias=use_bias, capture=self.capture,
                    compute_dtype=self.compute_dtype,
                    frozen_weights=self.frozen_weights, use_pallas=self.use_pallas,
                    # ReLU-variant inputs (except the image) are post-ReLU/
                    # pool; GELU outputs are signed
                    nonneg_input=(i > 0 and not self.gelu_variant),
                    layer_id=i, name=f"conv{i}",
                )(x)
                x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.compute_dtype, name=f"bn{i}")(
                    x, use_running_average=not train)
                if self.gelu_variant:
                    x = LayeroutQuant(qbit=self.qbit, name=f"loq{i}")(x)
                x = act(x)
                i += 1
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1) + Flatten

        def fc(x, features, sid, name, final=False):
            x = QuantDense(
                features=features, qbit=self.qbit,
                ka=float(self.scales.ka[sid]), kw=float(self.scales.kw[sid]),
                capture=self.capture, compute_dtype=self.compute_dtype,
                frozen_weights=self.frozen_weights, use_pallas=self.use_pallas,
                nonneg_input=not self.gelu_variant, layer_id=sid, name=name,
            )(x)
            if final:
                return x
            if self.gelu_variant:
                x = LayeroutQuant(qbit=self.qbit, name=f"{name}_loq")(x)
            x = act(x)
            return nn.Dropout(rate=drop_rate, deterministic=not train)(x)

        if self.gelu_variant:
            sids = (13, 14, 15)
        else:
            sids = (13, 13, 13)  # reference vgg16.py:99-108 reuses index 13
        x = fc(x, 512, sids[0], "fc1")
        x = fc(x, 256, sids[1], "fc2")
        x = fc(x, self.num_classes, sids[2], "fc3", final=True)
        return x
