"""Fused SLFP8 MobileNetV1 inference path (TPU serving fast path).

Same design as :mod:`models.resnet50_fused` applied to the reference's
primary model family (nets_cifar/mobilenetv1.py:10, nets_imgnet/
mobilenetv1.py:11): a functional executor over the *same* frozen variables
as :class:`models.mobilenetv1.MobileNetV1` —

- BatchNorm folded offline into the per-channel Ka*Kw affine,
- each conv's epilogue emits the *next* conv's quantized input (the ReLU +
  1/Ka + SLFP<3,4> quantize chain fuses into the conv's output pass),
- optional space-to-depth stem (``s2d_stem``) — measured SLOWER here
  (22882 vs 23261 img/s, v5e batch 256: the 3x3 stem is too small for the
  rearrangement to pay off), so off by default; the executor overall beats
  the module path 23261 vs 21673 img/s (+7.3%).

Covers the ReLU variants (CIFAR quantized-classifier and ImageNet
fp32-classifier, reference nets_imgnet/mobilenetv1.py:61); the Swish/
layerout-quant variant keeps the module path (its SFP<4,4> + Swish chain is
a different epilogue).  Weights must be pre-quantized
(``ops.freeze.prequantize_variables``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cnns_slfp_quantization_tpu.kernels import qmm
from cnns_slfp_quantization_tpu.models.mobilenetv1 import _DW_CONFIG
from cnns_slfp_quantization_tpu.models.resnet50_fused import (
    _bn_fold,
    _space_to_depth_stem,
    _wv,
    _xla_conv,
)


def fused_apply(variables, x, *, scales, quant_classifier: bool = True,
                s2d_stem: bool = False) -> jnp.ndarray:
    """SLFP8 MobileNetV1 forward on pre-quantized (frozen) variables."""
    params = variables["params"]
    stats = variables["batch_stats"]
    ka, kw = scales.ka, scales.kw

    def kaw(i):
        return float(ka[i]) * float(kw[i])

    def recip(i):
        return float(1.0 / np.float64(np.float32(ka[i])))

    def post(y, i, *, quant_next=None):
        """BN-folded affine + ReLU (+ the next conv's quantize)."""
        s, t = _bn_fold(params[f"bn{i}"], stats[f"bn{i}"], kaw(i))
        y = jnp.maximum(y * s + t, 0.0)
        if quant_next is not None:
            return qmm.quantize_act_pass(y, recip(quant_next))
        return y.astype(jnp.bfloat16)

    # --- stem: 3x3/s2/p1, signed input quantize --------------------------
    xq = qmm.quantize_act_pass(x, recip(0), nonneg=False)
    w0 = _wv(params["conv0"]["kernel"])
    if s2d_stem:
        y = _space_to_depth_stem(xq, w0, pad=1)
    else:
        y = _xla_conv(xq, w0, stride=2, pad=1)
    y = post(y, 0, quant_next=1)

    # --- 13 depthwise-separable blocks ------------------------------------
    last = len(_DW_CONFIG) - 1
    for b, (inp, _, stride) in enumerate(_DW_CONFIG):
        i_dw, i_pw = 1 + 2 * b, 2 + 2 * b
        y = _xla_conv(y, _wv(params[f"conv{i_dw}"]["kernel"]), stride=stride,
                      pad=1, groups=inp)
        y = post(y, i_dw, quant_next=i_pw)
        y = _xla_conv(y, _wv(params[f"conv{i_pw}"]["kernel"]))
        # the classifier's quantize happens *after* pooling (reference
        # pools raw activations, nets_cifar/mobilenetv1.py:84-85), so the
        # last block emits raw bf16.
        y = post(y, i_pw, quant_next=None if b == last else i_dw + 2)

    # --- head: global avgpool (+ quantized FC, linear_Q semantics) --------
    xa = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
    wfc = _wv(params["fc"]["kernel"])
    if not quant_classifier:  # ImageNet variant: plain fp32 Linear
        return xa @ wfc.astype(xa.dtype) + params["fc"]["bias"]
    xq = qmm.quantize_act_pass(xa, recip(27))
    y = jnp.dot(xq, wfc.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    c = np.float32(kaw(27))
    return ((y + params["fc"]["bias"] / c) * c).astype(jnp.bfloat16)


def as_model(scales, **kwargs):
    """flax-convention ``apply(variables, x, train=...)`` wrapper."""

    class _FusedModel:
        @staticmethod
        def apply(variables, x, train=False):
            assert not train, "fused_apply is inference-only"
            return fused_apply(variables, x, scales=scales, **kwargs)

    return _FusedModel()
