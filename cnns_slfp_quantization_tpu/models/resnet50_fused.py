"""Fully-fused SLFP8 ResNet-50 inference path (TPU serving fast path).

A functional executor over the *same* variables dict as
:class:`models.resnet50.ResNet50` (params + batch_stats, identical names),
but with every bottleneck expressed as a chain of fused stages so no
standalone elementwise pass ever touches HBM:

  conv1  : 1x1 conv on pre-quantized input (or with a fused quantize
           prologue), epilogue Ka*Kw+BN fold, ReLU and the *next* layer's
           quantize — via XLA (default, fastest measured) or the Pallas
           ``qmm_fused`` kernel (``policy``, kept for packed serving).
  conv2  : XLA 3x3 conv (already MXU-tiled) on pre-quantized input; its
           BN+ReLU+quantize epilogue fuses into the conv kernel (kOutput).
  conv3  : epilogue adds the residual and applies ReLU, emitting the raw
           bf16 block output.
  block 0: conv1 and the downsample conv share one quantized input (their
           calibrated Ka are equal — same producer tensor; verified for the
           reference constants), produced by one fused XLA pass; the
           downsample conv runs in XLA (native stride-2).

Vs the module path (``models/resnet50.py``, ``use_pallas=False``): +8%
measured (9582 vs 8873 img/s, TPU v5e batch 256) — BatchNorm folds into the
Ka*Kw affine offline instead of running as a separate normalize, and stage
boundaries share one quantize pass between conv1 and the downsample conv.

Semantics follow the reference bottleneck (nets_imgnet/resnet50.py:71-90)
and quantized-conv scaling (utils/conv2d_func.py:20-25); weights must be
pre-quantized (``ops.freeze.prequantize_variables``).  BatchNorm is folded
into the epilogue affine in f32 — same math as inference BN, fused.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cnns_slfp_quantization_tpu.kernels import qmm
# (planes, blocks, stride, scale_base): the load-bearing layout contract is
# shared with the module model, not duplicated.
from cnns_slfp_quantization_tpu.models.resnet50 import _STAGES

# Per-layer implementation choice, A/B'd on TPU v5e batch-256 (docs/DESIGN.md):
# the all-XLA executor wins (9582 img/s vs 8873 module path vs 5389 with
# Pallas conv1) — the throughput gain comes from the BN fold + shared
# quantize structure, not from hand-written matmuls; XLA's conv pipelining
# beats the whole-K weight-stationary Pallas tiling at these shapes.  The
# Pallas policy values remain for the uint8-packed serving experiments.
# "chain": set of stage indices (0-3) whose stride-1 mid-stage bottlenecks
# run as ONE VMEM-resident Pallas kernel (kernels/chain.py — intermediates
# never touch HBM); only stages 2/3 (14x14/7x7) fit the VMEM budget.
DEFAULT_POLICY = {"conv1": "xla", "conv3": "xla", "chain": frozenset()}


def as_model(scales, **kwargs):
    """An object with the flax ``apply(variables, x, train=...)`` calling
    convention, running :func:`fused_apply` — what bench.py / serve.py /
    scan_throughput consume."""

    class _FusedModel:
        @staticmethod
        def apply(variables, x, train=False):
            assert not train, "fused_apply is inference-only"
            return fused_apply(variables, x, scales=scales, **kwargs)

    return _FusedModel()


def _wv(w):
    """Weight values for XLA convs: decode uint8 SLFP codes (packed
    serving, ``ops.freeze.pack_variables``) or pass float values through."""
    if w.dtype == jnp.uint8:
        from cnns_slfp_quantization_tpu.kernels.fused_matmul import (
            slfp34_decode_bits)

        return slfp34_decode_bits(w)
    return w


def _bn_fold(params, stats, extra_scale: float):
    """Folded inference BN affine: y*scale + shift, with Ka*Kw pre-merged."""
    scale = params["scale"] / jnp.sqrt(stats["var"] + 1e-5)
    shift = params["bias"] - stats["mean"] * scale
    return (scale * np.float32(extra_scale)).astype(jnp.float32), \
        shift.astype(jnp.float32)


def _xla_conv(xq, w, *, stride=1, pad=0, groups=1):
    return jax.lax.conv_general_dilated(
        xq.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32)


def _space_to_depth_stem(xq, w, *, pad=3):
    """kxk/s2/p<pad> stem conv as a (k'/2)x(k'/2)/s1 conv on 2x2
    space-to-depth input (k' = k rounded up to even).

    Mathematically exact rewrite (same sum, zero-padded kernel taps): a
    3-channel 7x7 conv runs at ~9% MXU input-channel utilization; the s2d
    form feeds 12 channels, the standard TPU ResNet stem trick.  Operates on
    already-quantized input (s2d is a permutation, so it commutes with the
    elementwise quantizer).
    """
    n, h, wdt, c = xq.shape
    k = w.shape[0]
    f = w.shape[-1]
    k2 = -(-k // 2) * 2  # kernel taps padded to even
    kb = k2 // 2         # conv extent in s2d space
    # reference output extent of conv kxk/s2/p<pad>
    oh, ow = (h + 2 * pad - k) // 2 + 1, (wdt + 2 * pad - k) // 2 + 1

    def trailing(extent, out):
        t = max(2 * out - 2 + k2 - pad - extent, 0)
        return t + ((pad + extent + t) & 1)

    th, tw = trailing(h, oh), trailing(wdt, ow)
    xp = jnp.pad(xq, ((0, 0), (pad, th), (pad, tw), (0, 0)))
    hp, wp = h + pad + th, wdt + pad + tw
    s2d = xp.reshape(n, hp // 2, 2, wp // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2, 4 * c)
    # kernel: zero-pad taps to k2 x k2, split each axis into
    # (outer=kb, parity=2) and fold the parities into the input-channel dim
    # in the same (row-parity, col-parity, channel) order as the s2d reshape.
    wk = jnp.pad(w, ((0, k2 - k), (0, k2 - k), (0, 0), (0, 0)))
    wb = wk.reshape(kb, 2, kb, 2, c, f).transpose(
        0, 2, 1, 3, 4, 5).reshape(kb, kb, 4 * c, f)
    y = jax.lax.conv_general_dilated(
        s2d.astype(jnp.bfloat16), wb.astype(jnp.bfloat16),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y[:, :oh, :ow, :]


def fused_apply(variables, x, *, scales,
                policy: Optional[dict] = None, s2d_stem: bool = True,
                interpret: Optional[bool] = None,
                _diag_quant_sites: Optional[frozenset] = None,
                _diag_blockin_fuse: str = "consumer") -> jax.Array:
    """SLFP8 ResNet-50 forward on pre-quantized (frozen) variables.

    The underscore-prefixed ``_diag_*`` knobs are PERF DIAGNOSIS ONLY
    (tools/bench_quant_sites.py, tools/bench_blockin.py) and deliberately
    produce WRONG numerics with identical shapes — never set them on a
    production path.  ``_diag_quant_sites``: subset of
    {"stem","blockin","c1out","c2out","c3out","head"} naming which
    activation-quantize sites stay enabled; None = all (production).
    Disabling a site feeds the consumer the raw bf16 tensor, isolating that
    site's VPU cost.
    """
    pol = dict(DEFAULT_POLICY, **(policy or {}))
    quant_sites = _diag_quant_sites
    blockin_fuse = _diag_blockin_fuse

    def q_on(site):
        return quant_sites is None or site in quant_sites
    params = variables["params"]
    stats = variables["batch_stats"]
    ka, kw = scales.ka, scales.kw
    # the shared stage-boundary quantize relies on conv1 and the downsample
    # conv having the same calibrated Ka (same producer tensor); holds for
    # the shipped constants, but guard against custom scale sets.
    for _, _, _, base in _STAGES:
        if float(ka[base]) != float(ka[base + 1]):
            raise ValueError(
                f"fused_apply requires ka[{base}] == ka[{base + 1}] "
                f"(downsample shares conv1's quantized input); got "
                f"{float(ka[base])} != {float(ka[base + 1])}")

    def kaw(sid):
        return float(ka[sid]) * float(kw[sid])

    def recip(sid):
        return float(1.0 / np.float64(np.float32(ka[sid])))

    def pallas_mm(xf, wname, sid, bn, **kw_args):
        w = params[wname]["kernel"]
        w2 = w.reshape(w.shape[-2], w.shape[-1])
        s, t = _bn_fold(params[bn], stats[bn], kaw(sid))
        lead = xf.shape[:-1]
        y = qmm.qmm_fused(xf.reshape(-1, xf.shape[-1]), w2, s, t,
                          interpret=interpret, **kw_args)
        return y.reshape(*lead, y.shape[-1])

    def xla_post(y, sid, bn, *, residual=None, relu=True, quant_next=None,
                 site=None):
        s, t = _bn_fold(params[bn], stats[bn], kaw(sid))
        y = y * s + t
        if residual is not None:
            y = y + residual.astype(jnp.float32)
        if relu:
            y = jnp.maximum(y, 0.0)
        if quant_next is not None and (site is None or q_on(site)):
            return qmm.quantize_act_pass(y, recip(quant_next))
        return y.astype(jnp.bfloat16)

    # --- stem: 7x7/2 XLA conv, signed input quantize, BN+ReLU, maxpool ----
    xq = (qmm.quantize_act_pass(x, recip(0), nonneg=False)
          if q_on("stem") else x.astype(jnp.bfloat16))
    if s2d_stem:
        y = _space_to_depth_stem(xq, _wv(params["conv1"]["kernel"]))
    else:
        y = _xla_conv(xq, _wv(params["conv1"]["kernel"]), stride=2, pad=3)
    # NOTE pool(Q(x)) == Q(pool(x)) exactly (monotone quantizer), so the
    # quantize could fuse into the stem epilogue — measured SLOWER (9395 vs
    # 9697 img/s): pre-pool it quantizes 4x the elements, and that VPU cost
    # exceeds the standalone pass's HBM round trip.  Keep it post-pool.
    y = xla_post(y, 0, "bn1")
    y = jax.lax.reduce_window(
        y, -jnp.inf if y.dtype == jnp.float32 else jnp.bfloat16(-jnp.inf),
        jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))

    # block-output stream: raw bf16 tensor (residual consumer) + optionally
    # the same tensor already quantized for the next block's conv1 (emitted
    # by the producer's epilogue as a second fusion output — saves the
    # standalone block-input quantize pass, the largest single quantize
    # cost measured by tools/bench_quant_sites.py: ~10% of the forward)
    xr_raw, xr_q = y, None
    for s_idx, (planes, blocks, stride, base) in enumerate(_STAGES):
        for b in range(blocks):
            bstride = stride if b == 0 else 1
            pre = f"layer{s_idx + 1}_{b}"
            sid = base + 3 * b
            has_ds = b == 0
            if has_ds:
                # conv1 & downsample share Ka (same producer tensor); the
                # shared quantized input was already emitted by the
                # producer's epilogue (previous stage's last conv3
                # quant_next), so no standalone pass.
                if xr_q is not None:
                    xq_sh = xr_q
                elif q_on("blockin"):
                    xq_sh = qmm.quantize_act_pass(xr_raw, recip(sid + 1))
                else:
                    xq_sh = xr_raw
                identity = _xla_conv(
                    xq_sh, _wv(params[f"{pre}_down_conv"]["kernel"]),
                    stride=bstride)
                identity = xla_post(identity, base, f"{pre}_down_bn",
                                    relu=False)
                c1_in, c1_recip = xq_sh, None
            else:
                identity = xr_raw
                if xr_q is not None:
                    c1_in, c1_recip = xr_q, None
                else:
                    c1_in, c1_recip = xr_raw, recip(sid + 1)

            last_of_stage_ = b == blocks - 1
            if last_of_stage_:
                qn_ = (_STAGES[s_idx + 1][3] + 1
                       if s_idx + 1 < len(_STAGES) else None)
            else:
                qn_ = sid + 4
            if not has_ds and s_idx in pol.get("chain", ()):
                # whole bottleneck as one VMEM-resident kernel: conv1/conv2
                # intermediates never touch HBM (kernels/chain.py)
                from cnns_slfp_quantization_tpu.kernels import chain

                xq_in = (c1_in if c1_recip is None
                         else qmm.quantize_act_pass(xr_raw, c1_recip))
                w1 = _wv(params[f"{pre}_conv1"]["kernel"])
                w2 = _wv(params[f"{pre}_conv2"]["kernel"])
                w3 = _wv(params[f"{pre}_conv3"]["kernel"])
                mid = w1.shape[-1]
                cch = w3.shape[-1]
                a1, t1 = _bn_fold(params[f"{pre}_bn1"], stats[f"{pre}_bn1"],
                                  kaw(sid + 1))
                a2, t2 = _bn_fold(params[f"{pre}_bn2"], stats[f"{pre}_bn2"],
                                  kaw(sid + 2))
                a3, t3 = _bn_fold(params[f"{pre}_bn3"], stats[f"{pre}_bn3"],
                                  kaw(sid + 3))
                raw, qout = chain.bottleneck_chain(
                    xq_in.astype(jnp.bfloat16),
                    identity.astype(jnp.bfloat16),
                    w1.reshape(w1.shape[-2], mid).astype(jnp.bfloat16),
                    w2.astype(jnp.bfloat16),
                    w3.reshape(mid, cch).astype(jnp.bfloat16),
                    a1, t1, a2, t2, a3, t3,
                    recip2=recip(sid + 2), recip3=recip(sid + 3),
                    recip_next=recip(qn_) if qn_ is not None else 1.0,
                    emit_raw=not (last_of_stage_ and qn_ is not None),
                    interpret=bool(interpret))
                if last_of_stage_:
                    xr_raw = qout if qn_ is not None else raw
                    xr_q = xr_raw if qn_ is not None else None
                else:
                    xr_raw, xr_q = raw, (qout if q_on("blockin") else None)
                continue

            # conv1 (1x1): quantize->mm->BN+ReLU->quantize-for-conv2
            if pol["conv1"] == "pallas":
                y1q = pallas_mm(
                    c1_in, f"{pre}_conv1", sid + 1, f"{pre}_bn1",
                    relu=True, quant_in_recip=c1_recip,
                    quant_out_recip=recip(sid + 2))
            else:
                c1q = (c1_in if c1_recip is None or not q_on("blockin")
                       else qmm.quantize_act_pass(c1_in, c1_recip))
                y1 = _xla_conv(c1q, _wv(params[f"{pre}_conv1"]["kernel"]))
                y1q = xla_post(y1, sid + 1, f"{pre}_bn1",
                               quant_next=sid + 2, site="c1out")

            # conv2 (3x3, stride): XLA conv; epilogue fuses into the conv
            y2 = _xla_conv(y1q, _wv(params[f"{pre}_conv2"]["kernel"]),
                           stride=bstride, pad=1)
            y2q = xla_post(y2, sid + 2, f"{pre}_bn2", quant_next=sid + 3,
                           site="c2out")

            # conv3 (1x1): mm->BN->+identity->ReLU -> block output.
            # Stage boundary: the raw tensor has no other consumer (the next
            # block's identity comes from its downsample conv), so only the
            # quantized form is emitted.  Mid-stage: the next block needs
            # BOTH the raw tensor (residual) and its quantized form (conv1
            # input) — emit them as two outputs of one epilogue.
            last_of_stage = b == blocks - 1
            if last_of_stage:
                qn = (_STAGES[s_idx + 1][3] + 1
                      if s_idx + 1 < len(_STAGES) else None)
            else:
                qn = sid + 4  # next block's conv1 input scale id
            if pol["conv3"] == "pallas":
                xr_raw = pallas_mm(
                    y2q, f"{pre}_conv3", sid + 3, f"{pre}_bn3",
                    relu=True,
                    quant_out_recip=(recip(qn) if last_of_stage and
                                     qn is not None else None),
                    residual=identity.reshape(-1, identity.shape[-1]))
                xr_q = xr_raw if last_of_stage and qn is not None else None
            else:
                y3 = _xla_conv(y2q, _wv(params[f"{pre}_conv3"]["kernel"]))
                if last_of_stage:
                    xr_raw = xla_post(y3, sid + 3, f"{pre}_bn3",
                                      residual=identity, quant_next=qn,
                                      site="c3out")
                    xr_q = xr_raw if qn is not None and q_on("c3out") else None
                elif blockin_fuse == "producer" and q_on("blockin"):
                    # express BOTH outputs as chains on the conv output y3:
                    # XLA can multi-output-fuse them into the conv epilogue
                    # (the affine+residual+relu recomputes — cheap VPU ops —
                    # while y3 and xr_raw stay out of the quantize's HBM path)
                    xr_raw = xla_post(y3, sid + 3, f"{pre}_bn3",
                                      residual=identity)
                    xr_q = xla_post(y3, sid + 3, f"{pre}_bn3",
                                    residual=identity, quant_next=qn)
                elif blockin_fuse == "pallas_dual" and q_on("blockin"):
                    # hand dual-output epilogue: BN affine + residual + ReLU
                    # computed once from the (materialized f32) conv output,
                    # raw bf16 + quantized bf16 written in one HBM pass
                    # (tools/bench_blockin.py lever A)
                    from cnns_slfp_quantization_tpu.kernels import epilogue

                    s, t = _bn_fold(params[f"{pre}_bn3"],
                                    stats[f"{pre}_bn3"], kaw(sid + 3))
                    xr_raw, xr_q = epilogue.dual_epilogue(
                        y3, identity, s, t, recip(qn), interpret=interpret)
                elif blockin_fuse == "packed" and q_on("blockin"):
                    # uint8 SLFP codes for the block-input stream: halves the
                    # standalone pass's write, but the XLA consumer conv
                    # needs a bf16 input, so a decode pass re-materializes it
                    # (tools/bench_blockin.py lever B)
                    from cnns_slfp_quantization_tpu.kernels import quantize

                    xr_raw = xla_post(y3, sid + 3, f"{pre}_bn3",
                                      residual=identity)
                    codes = quantize.slfp34_pack_bits(
                        xr_raw.astype(jnp.float32) * np.float32(recip(qn)))
                    xr_q = _wv(codes).astype(jnp.bfloat16)
                else:
                    xr_raw = xla_post(y3, sid + 3, f"{pre}_bn3",
                                      residual=identity)
                    xr_q = (qmm.quantize_act_pass(xr_raw, recip(qn))
                            if q_on("blockin") else None)

    # --- head: global avgpool + quantized FC (linear_Q semantics) ---------
    xa = jnp.mean(xr_raw.astype(jnp.float32), axis=(1, 2))
    xq = (qmm.quantize_act_pass(xa, recip(53)) if q_on("head")
          else xa.astype(jnp.bfloat16))
    wfc = params["fc"]["kernel"]
    y = jnp.dot(xq, _wv(wfc).astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    y = (y + params["fc"]["bias"] / np.float32(kaw(53))) * np.float32(kaw(53))
    return y.astype(jnp.bfloat16)
