"""ShuffleNetV2 for CIFAR-100 (reference: nets_cifar/shufflenet_v2.py).

Width-ratio-configurable (0.5/1/1.5/2x, reference :120-127).  All convs
quantized; SFP<4,4> layerout quantization + ReLU after the BNs marked in the
reference's ShuffleUnit (:61-99).  The stem is conv+BN with *no* activation
(:152-155).  Scale constants use divisor 15.0 (not 15.5; :141, :144).

Scale-index layout (reference _make_stage :312-320, see SURVEY.md):
  0: stem;  stage2: s2-unit 1-5, s1-units 6-8/9-11/12-14;
  stage3 (base 14): s2-unit +1..+5, 7 s1-units from +6 step 3;
  stage4 (base 40): s2-unit +1..+5, 3 s1-units from +6 step 3;
  55: conv5;  56: fc.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cnns_slfp_quantization_tpu.calib import ScaleSet
from cnns_slfp_quantization_tpu.ops import activations as act_lib
from cnns_slfp_quantization_tpu.ops.layers import LayeroutQuant, QuantConv, QuantDense


def channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    """NHWC channel shuffle (reference :31-45, NCHW view/transpose)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class ShuffleUnit(nn.Module):
    """One ShuffleNetV2 unit (reference ShuffleUnit :47-114).

    ``scale_ids``: 5 global scale indices for the stride-2/downsample form
    (residual conv1x1, dw3x3, conv1x1; shortcut dw3x3, conv1x1), 3 for the
    stride-1 identity form (residual convs only).
    """

    scales: ScaleSet
    scale_ids: Sequence[int]
    in_channels: int
    out_channels: int
    stride: int
    qbit: int = 32
    capture: Optional[str] = None
    compute_dtype: Optional[Any] = None
    frozen_weights: bool = False
    use_pallas: "bool | None" = None
    nonneg_in: bool = True  # unit input is a shuffled concat of ReLU outputs
                            # (False only for the first unit, fed by the stem BN)

    def _conv(self, sid, features, kernel, stride=1, groups=1, pad=0, name="",
              nonneg=False):
        return QuantConv(
            features=features, kernel_size=(kernel, kernel), qbit=self.qbit,
            ka=float(self.scales.ka[sid]), kw=float(self.scales.kw[sid]),
            strides=(stride, stride), padding=pad, feature_group_count=groups,
            use_bias=False, capture=self.capture, compute_dtype=self.compute_dtype,
            frozen_weights=self.frozen_weights, use_pallas=self.use_pallas,
            nonneg_input=nonneg, layer_id=sid, name=name,
        )

    def _bn(self, name):
        return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.compute_dtype, name=name)

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        ids = list(self.scale_ids)
        downsample = self.stride != 1 or self.in_channels != self.out_channels
        loq = lambda n: LayeroutQuant(qbit=self.qbit, name=n)

        if downsample:
            shortcut_in, residual_in = x, x
            rc = self.in_channels
        else:
            half = self.in_channels // 2
            shortcut_in, residual_in = x[..., :half], x[..., half:]
            rc = half

        # Residual branch (reference :63-74 / :88-99)
        r = self._conv(ids[0], rc, 1, name="res_conv1",
                       nonneg=self.nonneg_in)(residual_in)
        r = self._bn("res_bn1")(r, use_running_average=not train)
        r = act_lib.relu(loq("res_loq1")(r))
        r = self._conv(ids[1], rc, 3, self.stride, groups=rc, pad=1,
                       name="res_conv2", nonneg=True)(r)
        r = self._bn("res_bn2")(r, use_running_average=not train)
        out_half = self.out_channels // 2 if downsample else rc
        r = self._conv(ids[2], out_half, 1, name="res_conv3")(r)
        r = self._bn("res_bn3")(r, use_running_average=not train)
        r = act_lib.relu(loq("res_loq3")(r))

        if downsample:
            # Shortcut branch (reference :75-82)
            s = self._conv(ids[3], rc, 3, self.stride, groups=rc, pad=1,
                           name="short_conv1", nonneg=self.nonneg_in)(shortcut_in)
            s = self._bn("short_bn1")(s, use_running_average=not train)
            s = self._conv(ids[4], self.out_channels // 2, 1, name="short_conv2")(s)
            s = self._bn("short_bn2")(s, use_running_average=not train)
            s = act_lib.relu(loq("short_loq2")(s))
        else:
            s = shortcut_in

        x = jnp.concatenate([s, r], axis=-1)
        return channel_shuffle(x, 2)


_STAGE_CHANNELS = {0.5: [48, 96, 192, 1024], 1: [116, 232, 464, 1024],
                   1.5: [176, 352, 704, 1024], 2: [244, 488, 976, 2048]}


class ShuffleNetV2(nn.Module):
    scales: ScaleSet
    num_classes: int = 100
    qbit: int = 32
    ratio: float = 1
    capture: Optional[str] = None
    compute_dtype: Optional[Any] = None
    frozen_weights: bool = False
    use_pallas: "bool | None" = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        out_ch = _STAGE_CHANNELS[self.ratio]
        common = dict(qbit=self.qbit, capture=self.capture,
                      compute_dtype=self.compute_dtype, scales=self.scales,
                      frozen_weights=self.frozen_weights,
                      use_pallas=self.use_pallas)

        # Stem: conv + BN only (reference :152-155)
        x = QuantConv(
            features=24, kernel_size=(3, 3), qbit=self.qbit,
            ka=float(self.scales.ka[0]), kw=float(self.scales.kw[0]),
            padding=1, use_bias=False, capture=self.capture,
            compute_dtype=self.compute_dtype, frozen_weights=self.frozen_weights, use_pallas=self.use_pallas,
            layer_id=0, name="pre_conv",
        )(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.compute_dtype, name="pre_bn")(
            x, use_running_average=not train)

        def stage(x, sname, base, in_c, out_c, repeat):
            # reference _make_stage :312-320: stride-2 unit on slice [1:6],
            # then `repeat` stride-1 units at begin_num=6 step 3.
            x = ShuffleUnit(
                scale_ids=[base + 1 + j for j in range(5)],
                in_channels=in_c, out_channels=out_c, stride=2,
                name=f"{sname}_u0", nonneg_in=(base != 0), **common,
            )(x, train=train)
            for k in range(repeat):
                x = ShuffleUnit(
                    scale_ids=[base + 6 + 3 * k + j for j in range(3)],
                    in_channels=out_c, out_channels=out_c, stride=1,
                    name=f"{sname}_u{k + 1}", **common,
                )(x, train=train)
            return x

        x = stage(x, "stage2", 0, 24, out_ch[0], 3)
        x = stage(x, "stage3", 14, out_ch[0], out_ch[1], 7)
        x = stage(x, "stage4", 40, out_ch[1], out_ch[2], 3)

        x = QuantConv(
            features=out_ch[3], kernel_size=(1, 1), qbit=self.qbit,
            ka=float(self.scales.ka[55]), kw=float(self.scales.kw[55]),
            use_bias=False, capture=self.capture, compute_dtype=self.compute_dtype,
            frozen_weights=self.frozen_weights, use_pallas=self.use_pallas,
            nonneg_input=True, layer_id=55, name="conv5",
        )(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.compute_dtype, name="conv5_bn")(
            x, use_running_average=not train)
        x = act_lib.relu(LayeroutQuant(qbit=self.qbit, name="conv5_loq")(x))

        x = jnp.mean(x, axis=(1, 2))
        x = QuantDense(
            features=self.num_classes, qbit=self.qbit,
            ka=float(self.scales.ka[56]), kw=float(self.scales.kw[56]),
            capture=self.capture, compute_dtype=self.compute_dtype,
            frozen_weights=self.frozen_weights, use_pallas=self.use_pallas,
            nonneg_input=True, layer_id=56, name="fc",
        )(x)
        return x
