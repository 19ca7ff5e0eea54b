"""AlexNet for ImageNet-1k (reference: nets_imgnet/alexnet.py:18-116).

5 biased quantized convs + 3 quantized FCs; scale indices 0..7 in order.
Note the huge activation maxima (Ka up to 107.7, reference :23-30) — AlexNet
has no BatchNorm, so per-tensor max scaling is what keeps SLFP in range.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cnns_slfp_quantization_tpu.calib import ScaleSet
from cnns_slfp_quantization_tpu.ops import activations as act_lib
from cnns_slfp_quantization_tpu.ops.layers import QuantConv, QuantDense


class AlexNet(nn.Module):
    scales: ScaleSet
    num_classes: int = 1000
    qbit: int = 32
    capture: Optional[str] = None
    compute_dtype: Optional[Any] = None
    frozen_weights: bool = False
    use_pallas: "bool | None" = None

    def _conv(self, sid, features, kernel, stride=1, pad=0, nonneg=True):
        return QuantConv(
            features=features, kernel_size=(kernel, kernel), qbit=self.qbit,
            ka=float(self.scales.ka[sid]), kw=float(self.scales.kw[sid]),
            strides=(stride, stride), padding=pad, use_bias=True,
            capture=self.capture, compute_dtype=self.compute_dtype,
            frozen_weights=self.frozen_weights, use_pallas=self.use_pallas,
            nonneg_input=nonneg, layer_id=sid, name=f"conv{sid}",
        )

    def _fc(self, sid, features, name):
        # fc inputs are flattened/dropped-out ReLU outputs: nonneg
        return QuantDense(
            features=features, qbit=self.qbit,
            ka=float(self.scales.ka[sid]), kw=float(self.scales.kw[sid]),
            capture=self.capture, compute_dtype=self.compute_dtype,
            frozen_weights=self.frozen_weights, use_pallas=self.use_pallas,
            nonneg_input=True, layer_id=sid, name=name,
        )

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        pool = lambda x: nn.max_pool(x, (3, 3), strides=(2, 2))
        x = act_lib.relu(self._conv(0, 64, 11, stride=4, pad=2,
                                    nonneg=False)(x))
        x = pool(x)
        x = act_lib.relu(self._conv(1, 192, 5, pad=2)(x))
        x = pool(x)
        x = act_lib.relu(self._conv(2, 384, 3, pad=1)(x))
        x = act_lib.relu(self._conv(3, 256, 3, pad=1)(x))
        x = act_lib.relu(self._conv(4, 256, 3, pad=1)(x))
        x = pool(x)
        # torch view(B, 256*6*6) flattens CHW; transpose back to match the
        # reference's classifier weight layout on import.
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = act_lib.relu(self._fc(5, 4096, "fc1")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = act_lib.relu(self._fc(6, 4096, "fc2")(x))
        x = self._fc(7, self.num_classes, "fc3")(x)
        return x
