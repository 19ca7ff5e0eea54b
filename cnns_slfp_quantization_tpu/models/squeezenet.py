"""SqueezeNet 1.0 for ImageNet-1k (reference: nets_imgnet/squeezenet1_0.py).

All Fire-module convs and the final 1x1 classifier conv are biased quantized
convs.  Scale indices: 0 stem; Fire f (f = 0..7) uses 1+3f (squeeze),
2+3f (expand1x1), 3+3f (expand3x3); classifier conv is 25 (reference
:64-86).  Activation maxima reach 973.9 (:52) — no BN anywhere.
Reference pools use ``ceil_mode=True`` (:67), emulated with asymmetric
-inf padding.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cnns_slfp_quantization_tpu.calib import ScaleSet
from cnns_slfp_quantization_tpu.ops import activations as act_lib
from cnns_slfp_quantization_tpu.ops.layers import QuantConv

_FIRE_PLAN = [  # (squeeze, expand1x1, expand3x3); pools before fires 0, 3, 7
    (16, 64, 64), (16, 64, 64), (32, 128, 128),
    (32, 128, 128), (48, 192, 192), (48, 192, 192), (64, 256, 256),
    (64, 256, 256),
]
_POOL_BEFORE = {0, 3, 7}


def _ceil_max_pool(x: jax.Array, k: int = 3, s: int = 2) -> jax.Array:
    """torch MaxPool2d(k, s, ceil_mode=True) in NHWC."""
    pads = []
    for d in (1, 2):
        size = x.shape[d]
        out = -(-(size - k) // s) + 1  # ceil
        need = max((out - 1) * s + k - size, 0)
        pads.append((0, need))
    return nn.max_pool(x, (k, k), strides=(s, s), padding=tuple(pads))


class SqueezeNet(nn.Module):
    scales: ScaleSet
    num_classes: int = 1000
    qbit: int = 32
    capture: Optional[str] = None
    compute_dtype: Optional[Any] = None
    frozen_weights: bool = False
    use_pallas: "bool | None" = None

    def _conv(self, sid, features, kernel, stride=1, pad=0, name="",
              nonneg=True):
        return QuantConv(
            features=features, kernel_size=(kernel, kernel), qbit=self.qbit,
            ka=float(self.scales.ka[sid]), kw=float(self.scales.kw[sid]),
            strides=(stride, stride), padding=pad, use_bias=True,
            capture=self.capture, compute_dtype=self.compute_dtype,
            frozen_weights=self.frozen_weights, use_pallas=self.use_pallas,
            nonneg_input=nonneg, layer_id=sid, name=name,
        )

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = act_lib.relu(self._conv(0, 96, 7, stride=2, name="conv0",
                                    nonneg=False)(x))
        for f, (sq, e1, e3) in enumerate(_FIRE_PLAN):
            if f in _POOL_BEFORE:
                x = _ceil_max_pool(x)
            sid = 1 + 3 * f
            x = act_lib.relu(self._conv(sid, sq, 1, name=f"fire{f}_squeeze")(x))
            a = act_lib.relu(self._conv(sid + 1, e1, 1, name=f"fire{f}_expand1")(x))
            b = act_lib.relu(
                self._conv(sid + 2, e3, 3, pad=1, name=f"fire{f}_expand3")(x))
            x = jnp.concatenate([a, b], axis=-1)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = act_lib.relu(self._conv(25, self.num_classes, 1, name="classifier")(x))
        x = jnp.mean(x, axis=(1, 2))
        return x
