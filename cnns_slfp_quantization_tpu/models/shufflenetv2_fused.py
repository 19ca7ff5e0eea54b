"""Fused SLFP8 ShuffleNetV2 inference path (third fused-executor family).

The :mod:`models.resnet50_fused` pattern applied to ShuffleNetV2 (reference
nets_cifar/shufflenet_v2.py:47-114): a functional executor over the *same*
frozen variables as :class:`models.shufflenetv2.ShuffleNetV2` —

- BatchNorm folded offline into the per-channel Ka*Kw affine,
- every conv's epilogue carries the unit's full elementwise chain
  (BN affine -> SFP<4,4> layerout quantize -> ReLU -> the next conv's
  SLFP<3,4> input quantize) in one fused pass,
- a downsample unit's two branches read the same producer tensor; when
  their calibrated Ka agree (they do for the shipped constants — same
  producer), one shared quantize pass feeds both branch convs,
- channel split / concat / shuffle stay XLA reshape+transpose ops (pure
  layout; they fuse into the surrounding copies).

Semantics follow the reference ShuffleUnit (:47-114: conv1x1 -> bn -> loq ->
relu -> dw3x3 -> bn -> conv1x1 -> bn -> loq -> relu; shortcut dw3x3 -> bn ->
conv1x1 -> bn -> loq -> relu) and quantized-conv scaling
(utils/conv2d_func.py:20-25).  Weights must be pre-quantized
(``ops.freeze.prequantize_variables``); uint8-packed weights decode via
``_wv``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cnns_slfp_quantization_tpu.kernels import qmm
from cnns_slfp_quantization_tpu.models.shufflenetv2 import (
    _STAGE_CHANNELS,
    channel_shuffle,
)
from cnns_slfp_quantization_tpu.models.resnet50_fused import (
    _bn_fold,
    _wv,
    _xla_conv,
)
from cnns_slfp_quantization_tpu.ops import sfp


def fused_apply(variables, x, *, scales, ratio: float = 1,
                num_classes: int = 100) -> jnp.ndarray:
    """SLFP8 ShuffleNetV2 forward on pre-quantized (frozen) variables."""
    params = variables["params"]
    stats = variables["batch_stats"]
    ka, kw = scales.ka, scales.kw
    out_ch = _STAGE_CHANNELS[ratio]

    def kaw(i):
        return float(ka[i]) * float(kw[i])

    def recip(i):
        return float(1.0 / np.float64(np.float32(ka[i])))

    def post(y, sid, pp, sp, *, loq, quant_next=None, nonneg_next=True):
        """BN-folded affine (+ SFP<4,4> layerout quantize + ReLU) (+ the
        next conv's SLFP<3,4> quantize) — one fused elementwise chain on the
        conv output."""
        s, t = _bn_fold(pp, sp, kaw(sid))
        y = y * s + t
        if loq:
            # reference order: relu(loq(bn(x))) (shufflenet_v2.py:61-99)
            y = sfp.quantize_layerout(y, 8)
            y = jnp.maximum(y, 0.0)
        if quant_next is not None:
            return qmm.quantize_act_pass(y, recip(quant_next),
                                         nonneg=nonneg_next)
        return y.astype(jnp.bfloat16)

    def unit(x, name, ids, in_c, out_c, stride, *, nonneg_in=True):
        p, st = params[name], stats[name]
        downsample = stride != 1 or in_c != out_c
        if downsample:
            short_in = res_in = x
            rc = in_c
            # both branch convs consume the same producer tensor; equal Ka
            # (true for the shipped constants) lets one quantize pass feed
            # both — otherwise fall back to two passes
            if float(ka[ids[0]]) == float(ka[ids[3]]):
                shared = qmm.quantize_act_pass(x, recip(ids[0]),
                                               nonneg=nonneg_in)
                rq = sq = shared
            else:
                rq = qmm.quantize_act_pass(res_in, recip(ids[0]),
                                           nonneg=nonneg_in)
                sq = qmm.quantize_act_pass(short_in, recip(ids[3]),
                                           nonneg=nonneg_in)
        else:
            half = in_c // 2
            short_in, res_in = x[..., :half], x[..., half:]
            rc = half
            rq = qmm.quantize_act_pass(res_in, recip(ids[0]),
                                       nonneg=nonneg_in)

        # residual branch: conv1x1 -> bn+loq+relu -> dw3x3 -> bn ->
        # conv1x1 -> bn+loq+relu
        r = _xla_conv(rq, _wv(p["res_conv1"]["kernel"]))
        r = post(r, ids[0], p["res_bn1"], st["res_bn1"], loq=True,
                 quant_next=ids[1], nonneg_next=True)
        r = _xla_conv(r, _wv(p["res_conv2"]["kernel"]), stride=stride,
                      pad=1, groups=rc)
        # bn2 has no loq/relu; its output (signed) feeds conv3's quantize
        r = post(r, ids[1], p["res_bn2"], st["res_bn2"], loq=False,
                 quant_next=ids[2], nonneg_next=False)
        r = _xla_conv(r, _wv(p["res_conv3"]["kernel"]))
        r = post(r, ids[2], p["res_bn3"], st["res_bn3"], loq=True)

        if downsample:
            s = _xla_conv(sq, _wv(p["short_conv1"]["kernel"]), stride=stride,
                          pad=1, groups=rc)
            s = post(s, ids[3], p["short_bn1"], st["short_bn1"], loq=False,
                     quant_next=ids[4], nonneg_next=False)
            s = _xla_conv(s, _wv(p["short_conv2"]["kernel"]))
            s = post(s, ids[4], p["short_bn2"], st["short_bn2"], loq=True)
        else:
            s = short_in
        return channel_shuffle(jnp.concatenate([s, r], axis=-1), 2)

    # --- stem: 3x3/p1 conv + BN, NO activation (reference :152-155) -------
    xq = qmm.quantize_act_pass(x, recip(0), nonneg=False)
    y = _xla_conv(xq, _wv(params["pre_conv"]["kernel"]), pad=1)
    y = post(y, 0, params["pre_bn"], stats["pre_bn"], loq=False)

    # --- 3 stages (reference _make_stage :312-320 index layout) -----------
    for sname, base, in_c, out_c, repeat, nn_in in (
            ("stage2", 0, 24, out_ch[0], 3, False),
            ("stage3", 14, out_ch[0], out_ch[1], 7, True),
            ("stage4", 40, out_ch[1], out_ch[2], 3, True)):
        y = unit(y, f"{sname}_u0", [base + 1 + j for j in range(5)],
                 in_c, out_c, 2, nonneg_in=nn_in)
        for k in range(repeat):
            y = unit(y, f"{sname}_u{k + 1}",
                     [base + 6 + 3 * k + j for j in range(3)],
                     out_c, out_c, 1)

    # --- conv5 + bn + loq + relu, global avgpool, quantized FC ------------
    yq = qmm.quantize_act_pass(y, recip(55), nonneg=True)
    y = _xla_conv(yq, _wv(params["conv5"]["kernel"]))
    y = post(y, 55, params["conv5_bn"], stats["conv5_bn"], loq=True)

    xa = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
    xq = qmm.quantize_act_pass(xa, recip(56), nonneg=True)
    wfc = _wv(params["fc"]["kernel"])
    yl = jnp.dot(xq, wfc.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    c = np.float32(kaw(56))
    return ((yl + params["fc"]["bias"] / c) * c).astype(jnp.bfloat16)


def as_model(scales, **kwargs):
    """flax-convention ``apply(variables, x, train=...)`` wrapper."""

    class _FusedModel:
        @staticmethod
        def apply(variables, x, train=False):
            assert not train, "fused_apply is inference-only"
            return fused_apply(variables, x, scales=scales, **kwargs)

    return _FusedModel()
