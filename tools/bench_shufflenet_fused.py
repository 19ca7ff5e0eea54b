"""A/B the fused ShuffleNetV2 executor vs the module path (VERDICT r4 #7).

Same protocol as the ResNet/MobileNet executor A/Bs: bf16 frozen module
path vs the BN-folded fused executor, batch 256, CIFAR 32px, plus a
correctness gate (prediction match on random inputs).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_shufflenet_fused.py
Verdict: docs/DESIGN.md round 5.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from cnns_slfp_quantization_tpu import calib, models
from cnns_slfp_quantization_tpu.models import shufflenetv2_fused
from cnns_slfp_quantization_tpu.ops import freeze
from cnns_slfp_quantization_tpu.utils.profiling import scan_throughput


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    batch = 256
    scales = calib.load_scales("shufflenetv2_cifar")
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3),
                          jnp.float32)
    m = models.create_model("shufflenetv2", 8)
    v = m.init(jax.random.PRNGKey(1), x[:1], train=False)
    cap = models.create_model("shufflenetv2", 8, capture="full")
    vf = freeze.prequantize_variables(cap, v, x[:1], dtype=jnp.bfloat16)

    module = models.create_model("shufflenetv2", 8,
                                 compute_dtype=jnp.bfloat16,
                                 frozen_weights=True, use_pallas=False)
    fused = shufflenetv2_fused.as_model(scales)

    # correctness gate on-chip
    xs = x[:16]
    want = np.asarray(jax.jit(
        lambda v, x: module.apply(v, x, train=False))(vf, xs), np.float32)
    got = np.asarray(jax.jit(
        lambda v, x: fused.apply(v, x, train=False))(vf, xs), np.float32)
    cos = float(np.sum(got * want)
                / (np.linalg.norm(got) * np.linalg.norm(want) + 1e-30))
    print(json.dumps({"gate": "fused-vs-module", "cos": round(cos, 5),
                      "top1_match": float(np.mean(
                          np.argmax(got, -1) == np.argmax(want, -1)))}),
          flush=True)

    for name, model in (("module_bf16_frozen", module), ("fused", fused)):
        r = scan_throughput(model, vf, x)
        print(json.dumps({"config": name, "img_per_sec": round(r, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
