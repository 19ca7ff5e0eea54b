"""A/B the Pallas dw3x3 VPU kernel vs XLA's grouped depthwise conv.

Standalone layer bench at ImageNet-MobileNetV1 stride-1 shapes (batch as
given), both paths computing the full serving chain
dw3x3 -> BN affine -> ReLU -> SLFP<3,4> act quantize -> bf16.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_depthwise.py
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cnns_slfp_quantization_tpu.kernels import depthwise  # noqa: E402
from cnns_slfp_quantization_tpu.ops import sfp  # noqa: E402

SHAPES = [(112, 64), (56, 128), (28, 256), (14, 512), (7, 1024)]


def xla_chain(x, w, scale, shift, recip):
    y = jax.lax.conv_general_dilated(
        x, w.reshape(3, 3, 1, -1).astype(x.dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y * scale + shift, 0.0)
    return sfp._act_bf16_bits(y, recip, 8, True)


def pallas_chain(x, w, scale, shift, recip):
    return depthwise.dw3x3(x, w.astype(jnp.float32), scale=scale, shift=shift,
                           relu=True, quant_out_recip=recip)


def bench(fn, x, w, scale, shift, steps=32):
    @jax.jit
    def run(x, w, scale, shift):
        def body(acc, i):
            xi = (x.astype(jnp.float32) * (1 + i * 1e-6)).astype(x.dtype)
            y = fn(xi, w, scale, shift, 1.0 / 1.7)
            return acc + jnp.sum(y.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(steps, dtype=jnp.float32))
        return acc

    float(run(x, w, scale, shift))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, w, scale, shift))
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=32)
    cfg = p.parse_args()
    for hw, c in SHAPES:
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (cfg.batch, hw, hw, c),
                              jnp.bfloat16)
        w = jax.random.normal(rng, (3, 3, c), jnp.float32) * 0.3
        scale = jnp.ones((c,), jnp.float32) * 1.1
        shift = jnp.zeros((c,), jnp.float32)
        t_xla = bench(xla_chain, x, w, scale, shift, cfg.steps)
        t_pal = bench(pallas_chain, x, w, scale, shift, cfg.steps)
        gb = cfg.batch * hw * hw * c * (2 + 2) / 1e9
        print(json.dumps({
            "shape": f"{hw}x{hw}x{c}", "batch": cfg.batch,
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "xla_GBps": round(gb / t_xla, 1),
            "pallas_GBps": round(gb / t_pal, 1),
            "speedup": round(t_xla / t_pal, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
