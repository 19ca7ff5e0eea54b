"""Per-fused-op HBM roofline for the SLFP8 ResNet-50 fused executor.

Substantiates "HBM-bound conv time" (docs/DESIGN.md) with numbers: for every
distinct fused op class in ``models/resnet50_fused.fused_apply`` (batch 256),
measure its on-device time (scan-chained, relay-proof) and compute

  - HBM bytes in+out (bf16 activations, bf16 weights, f32 affine),
  - implied GB/s vs the chip's HBM peak (v5e: 819 GB/s),
  - MXU FLOPs and implied TFLOP/s vs bf16 peak (v5e: ~197 TFLOP/s),
  - the roofline-limited minimum time max(bytes/BW, flops/peak).

CSE-hoisting discipline: a scan body whose inputs are all loop-invariant is
hoisted by XLA's while-loop LICM, so every row must vary per iteration.
Conv-first rows perturb the WEIGHT (cheap: weight bytes << activation
bytes, and the conv still re-reads its invariant input from HBM each
iteration); elementwise-first rows perturb the INPUT (free: the perturb
fuses into the elementwise consumer).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_roofline.py
Results: docs/DESIGN.md round-5 roofline table.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 819.0          # measured-peak v5e HBM bandwidth
MXU_TFLOPS = 197.0        # v5e bf16 peak
BATCH = 256
# Two-length difference method: the axon relay adds a fixed ~30ms
# dispatch+fetch round trip per host call, which at small step counts
# swamps sub-ms ops (first run of this tool measured a flat ~1.25ms floor
# on every row = 30ms / 24 steps).  Timing the SAME scan at two lengths and
# dividing the difference cancels every fixed cost exactly.
STEPS_A, STEPS_B = 32, 160


def _scan_time(fn, *invariant, vary_weight=None, vary_input=None):
    """Per-invocation seconds via the (STEPS_B - STEPS_A) scan difference.

    Exactly one of vary_weight / vary_input is perturbed per iteration to
    defeat loop-invariant code motion.
    """

    def make(steps):
        @jax.jit
        def run(args, vw, vi):
            # y is threaded through the loop CARRY (consumed only via a tiny
            # slice): if y fed jnp.sum directly, XLA fuses the reduction into
            # the op's epilogue and never writes y to HBM — the first version
            # of this tool measured several rows at an impossible >1.6 TB/s
            # because the output write had been elided.
            def body(carry, i):
                acc, y_prev = carry
                f = 1.0 + i.astype(jnp.float32) * 1e-6
                w = (None if vw is None
                     else (vw.astype(jnp.float32) * f).astype(vw.dtype))
                x = (None if vi is None
                     else (vi.astype(jnp.float32) * f).astype(vi.dtype))
                extra = tuple(a for a in (x, w) if a is not None)
                y = fn(*extra, *args)
                acc = acc + jnp.sum(y_prev.reshape(-1)[:8].astype(jnp.float32))
                return (acc, y), None

            extra0 = tuple(a for a in (vi, vw) if a is not None)
            y0 = jax.eval_shape(lambda: fn(*extra0, *args))
            (acc, y_last), _ = jax.lax.scan(
                body, (jnp.float32(0), jnp.zeros(y0.shape, y0.dtype)),
                jnp.arange(steps))
            return acc + jnp.sum(y_last.reshape(-1)[:8].astype(jnp.float32))

        return run

    times = {}
    for steps in (STEPS_A, STEPS_B):
        run = make(steps)
        float(run(invariant, vary_weight, vary_input))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(invariant, vary_weight, vary_input))
            best = min(best, time.perf_counter() - t0)
        times[steps] = best
    return (times[STEPS_B] - times[STEPS_A]) / (STEPS_B - STEPS_A)


def _conv(x, w, *, stride=1, pad=0):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def conv_epilogue_row(name, hw, cin, cout, *, k=1, stride=1, residual=False,
                      quant=True, count=1):
    """One executor conv + its fused epilogue (BN affine [+residual] + ReLU
    [+ next-layer quantize]), timed with the weight perturbed."""
    from cnns_slfp_quantization_tpu.kernels import qmm

    pad = (k - 1) // 2
    oh = hw // stride
    key = jax.random.PRNGKey(hash(name) % (2**31))
    x = (jax.random.normal(key, (BATCH, hw, hw, cin), jnp.float32)
         .astype(jnp.bfloat16))
    w = (jax.random.normal(key, (k, k, cin, cout), jnp.float32) * 0.05
         ).astype(jnp.bfloat16)
    s = jnp.abs(jax.random.normal(key, (cout,), jnp.float32)) + 0.5
    t = jax.random.normal(key, (cout,), jnp.float32)
    res = (jax.random.normal(key, (BATCH, oh, oh, cout), jnp.float32)
           .astype(jnp.bfloat16) if residual else None)

    def fn(wv, xv, sv, tv, *rest):
        y = _conv(xv, wv, stride=stride, pad=pad)
        y = y * sv + tv
        if rest:
            y = y + rest[0].astype(jnp.float32)
        y = jnp.maximum(y, 0.0)
        if quant:
            return qmm.quantize_act_pass(y, 0.37)
        return y.astype(jnp.bfloat16)

    args = (x, s, t) + ((res,) if residual else ())
    sec = _scan_time(fn, *args, vary_weight=w)
    n_in = BATCH * hw * hw * cin
    n_out = BATCH * oh * oh * cout
    bytes_ = (2 * n_in + 2 * w.size + 2 * n_out + 8 * cout
              + (2 * n_out if residual else 0))
    flops = 2 * n_out * cin * k * k
    return _row(name, sec, bytes_, flops, count)


def quantize_row(name, hw, c, count):
    """Standalone block-input quantize pass (read bf16, write bf16)."""
    from cnns_slfp_quantization_tpu.kernels import qmm

    x = (jax.random.normal(jax.random.PRNGKey(0), (BATCH, hw, hw, c),
                           jnp.float32).astype(jnp.bfloat16))
    sec = _scan_time(lambda xv: qmm.quantize_act_pass(xv, 0.37),
                     vary_input=x)
    n = BATCH * hw * hw * c
    return _row(name, sec, 4 * n, 0, count)


def stem_row():
    """Input quantize + space-to-depth 7x7/s2 stem conv + BN/ReLU (the
    executor's entry): elementwise-first, so the input is perturbed."""
    from cnns_slfp_quantization_tpu.kernels import qmm
    from cnns_slfp_quantization_tpu.models.resnet50_fused import (
        _space_to_depth_stem)

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (BATCH, 224, 224, 3), jnp.float32)
    w = (jax.random.normal(key, (7, 7, 3, 64), jnp.float32) * 0.05
         ).astype(jnp.bfloat16)
    s = jnp.abs(jax.random.normal(key, (64,), jnp.float32)) + 0.5
    t = jax.random.normal(key, (64,), jnp.float32)

    def fn(xv, wv, sv, tv):
        xq = qmm.quantize_act_pass(xv, 0.37, nonneg=False)
        y = _space_to_depth_stem(xq, wv)
        return jnp.maximum(y * sv + tv, 0.0).astype(jnp.bfloat16)

    sec = _scan_time(fn, w, s, t, vary_input=x)
    n_in = BATCH * 224 * 224 * 3
    n_out = BATCH * 112 * 112 * 64
    bytes_ = 4 * n_in + 2 * n_in + 2 * n_in + 2 * w.size + 2 * n_out
    flops = 2 * n_out * 3 * 49
    return _row("stem(q+s2d conv7x7/2+bn)", sec, bytes_, flops, 1)


def maxpool_row():
    x = (jax.random.normal(jax.random.PRNGKey(2), (BATCH, 112, 112, 64),
                           jnp.float32).astype(jnp.bfloat16))

    def fn(xv):
        return jax.lax.reduce_window(
            xv, jnp.bfloat16(-jnp.inf), jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))

    sec = _scan_time(fn, vary_input=x)
    n_in = BATCH * 112 * 112 * 64
    return _row("maxpool3x3/2", sec, 2 * n_in + 2 * n_in // 4, 0, 1)


def head_row():
    from cnns_slfp_quantization_tpu.kernels import qmm

    key = jax.random.PRNGKey(3)
    x = (jax.random.normal(key, (BATCH, 7, 7, 2048), jnp.float32)
         .astype(jnp.bfloat16))
    w = (jax.random.normal(key, (2048, 1000), jnp.float32) * 0.05
         ).astype(jnp.bfloat16)
    b = jax.random.normal(key, (1000,), jnp.float32)

    def fn(xv, wv, bv):
        xa = jnp.mean(xv.astype(jnp.float32), axis=(1, 2))
        xq = qmm.quantize_act_pass(xa, 0.37)
        y = jnp.dot(xq, wv, preferred_element_type=jnp.float32)
        return ((y + bv) * 1.7).astype(jnp.bfloat16)

    sec = _scan_time(fn, w, b, vary_input=x)
    n_in = BATCH * 7 * 7 * 2048
    bytes_ = 2 * n_in + 2 * w.size + 2 * BATCH * 1000
    flops = 2 * BATCH * 2048 * 1000
    return _row("head(avgpool+q+fc)", sec, bytes_, flops, 1)


def _row(name, sec, bytes_, flops, count):
    t_hbm = bytes_ / (HBM_GBPS * 1e9)
    t_mxu = flops / (MXU_TFLOPS * 1e12)
    bound = max(t_hbm, t_mxu)
    return {
        "op": name, "count": count, "ms": round(sec * 1e3, 3),
        "MB": round(bytes_ / 1e6, 1),
        "GBps": round(bytes_ / sec / 1e9, 1),
        "gflops": round(flops / 1e9, 1),
        "tflops": round(flops / sec / 1e12, 2),
        "roofline_ms": round(bound * 1e3, 3),
        "roofline_frac": round(bound / sec, 3),
        "bound": "mxu" if t_mxu > t_hbm else "hbm",
        "total_ms": round(count * sec * 1e3, 3),
        "total_roofline_ms": round(count * bound * 1e3, 3),
    }


def main():
    import os

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rows = [stem_row(), maxpool_row(), head_row()]
    for r in rows:
        print(json.dumps(r), flush=True)
    # (name, hw_in, cin, cout, k, stride, residual, quant, count)
    # counts from _STAGES (3/4/6/3 blocks); mid-stage conv3 epilogues do NOT
    # quantize (the standalone blockin pass does), last-of-stage ones do.
    specs = [
        # stage 1 @56: block0 conv1 reads pooled 64ch; blocks1-2 read 256ch
        ("s1.b0.conv1 1x1 64->64 @56", 56, 64, 64, 1, 1, False, True, 1),
        ("s1.conv1 1x1 256->64 @56", 56, 256, 64, 1, 1, False, True, 2),
        ("s1.conv2 3x3 64->64 @56", 56, 64, 64, 3, 1, False, True, 3),
        ("s1.conv3+res 1x1 64->256 @56", 56, 64, 256, 1, 1, True, False, 2),
        ("s1.conv3+res+q (stage bnd)", 56, 64, 256, 1, 1, True, True, 1),
        ("s1.down 1x1 64->256 @56", 56, 64, 256, 1, 1, False, False, 1),
        # stage 2: transition reads 56x56x256, conv2 strides to 28
        ("s2.b0.conv1 1x1 256->128 @56", 56, 256, 128, 1, 1, False, True, 1),
        ("s2.b0.conv2 3x3/2 128 @56->28", 56, 128, 128, 3, 2, False, True, 1),
        ("s2.b0.down 1x1/2 256->512", 56, 256, 512, 1, 2, False, False, 1),
        ("s2.conv1 1x1 512->128 @28", 28, 512, 128, 1, 1, False, True, 3),
        ("s2.conv2 3x3 128 @28", 28, 128, 128, 3, 1, False, True, 3),
        ("s2.conv3+res 1x1 128->512 @28", 28, 128, 512, 1, 1, True, False, 3),
        ("s2.conv3+res+q (stage bnd)", 28, 128, 512, 1, 1, True, True, 1),
        # stage 3
        ("s3.b0.conv1 1x1 512->256 @28", 28, 512, 256, 1, 1, False, True, 1),
        ("s3.b0.conv2 3x3/2 256 @28->14", 28, 256, 256, 3, 2, False, True, 1),
        ("s3.b0.down 1x1/2 512->1024", 28, 512, 1024, 1, 2, False, False, 1),
        ("s3.conv1 1x1 1024->256 @14", 14, 1024, 256, 1, 1, False, True, 5),
        ("s3.conv2 3x3 256 @14", 14, 256, 256, 3, 1, False, True, 5),
        ("s3.conv3+res 1x1 256->1024 @14", 14, 256, 1024, 1, 1, True, False, 5),
        ("s3.conv3+res+q (stage bnd)", 14, 256, 1024, 1, 1, True, True, 1),
        # stage 4
        ("s4.b0.conv1 1x1 1024->512 @14", 14, 1024, 512, 1, 1, False, True, 1),
        ("s4.b0.conv2 3x3/2 512 @14->7", 14, 512, 512, 3, 2, False, True, 1),
        ("s4.b0.down 1x1/2 1024->2048", 14, 1024, 2048, 1, 2, False, False, 1),
        ("s4.conv1 1x1 2048->512 @7", 7, 2048, 512, 1, 1, False, True, 2),
        ("s4.conv2 3x3 512 @7", 7, 512, 512, 3, 1, False, True, 2),
        ("s4.conv3+res 1x1 512->2048 @7", 7, 512, 2048, 1, 1, True, False, 2),
        ("s4.conv3+res (last, no q)", 7, 512, 2048, 1, 1, True, False, 1),
    ]
    for (name, hw, cin, cout, k, stride, res, quant, count) in specs:
        rows.append(conv_epilogue_row(name, hw, cin, cout, k=k,
                                      stride=stride, residual=res,
                                      quant=quant, count=count))
        print(json.dumps(rows[-1]), flush=True)
    # standalone block-input quantize passes (consumer placement):
    # one per NON-last block of each stage
    for (name, hw, c, count) in [
        ("blockin q @56x256", 56, 256, 2), ("blockin q @28x512", 28, 512, 3),
        ("blockin q @14x1024", 14, 1024, 5), ("blockin q @7x2048", 7, 2048, 2),
    ]:
        rows.append(quantize_row(name, hw, c, count))
        print(json.dumps(rows[-1]), flush=True)

    total_ms = sum(r["total_ms"] for r in rows)
    total_roof = sum(r["total_roofline_ms"] for r in rows)
    print(json.dumps({
        "summary": "sum over ops (batch 256)",
        "total_ms": round(total_ms, 2),
        "total_roofline_ms": round(total_roof, 2),
        "roofline_frac": round(total_roof / total_ms, 3),
        "implied_img_per_sec": round(BATCH / (total_ms / 1e3), 1),
    }), flush=True)


if __name__ == "__main__":
    main()
