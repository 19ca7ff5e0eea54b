"""A/B the VMEM-resident bottleneck chain kernel on the headline config.

Measures the full fused SLFP8 ResNet-50 (batch 256) with mid-stage
bottlenecks of stages 3/4 (14x14x1024, 7x7x2048) run as single Pallas
kernels (kernels/chain.py) vs the production all-XLA executor, plus the
single-stage variants to localize any win/loss.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_chain.py
Verdict: docs/DESIGN.md round 5.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from cnns_slfp_quantization_tpu import calib, models
from cnns_slfp_quantization_tpu.models import resnet50_fused
from cnns_slfp_quantization_tpu.ops import freeze
from cnns_slfp_quantization_tpu.utils.profiling import scan_throughput

CONFIGS = {
    "production": {},
    "chain_s3": {"chain": frozenset({2})},
    "chain_s4": {"chain": frozenset({3})},
    "chain_s34": {"chain": frozenset({2, 3})},
}


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    batch = 256
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 224, 224, 3),
                          jnp.float32)
    init_model = models.create_model("resnet", 8)
    v = init_model.init(jax.random.PRNGKey(1), x[:1], train=False)
    cap = models.create_model("resnet", 8, capture="full")
    vf = freeze.prequantize_variables(cap, v, x[:1], dtype=jnp.bfloat16)
    scales = calib.load_scales("resnet50_imgnet")

    # correctness gate on-chip first (small batch): compiled Mosaic vs XLA
    xs = x[:8]
    want = np.asarray(jax.jit(lambda v, x: resnet50_fused.fused_apply(
        v, x, scales=scales))(vf, xs), np.float32)
    got = np.asarray(jax.jit(lambda v, x: resnet50_fused.fused_apply(
        v, x, scales=scales,
        policy={"chain": frozenset({2, 3})}))(vf, xs), np.float32)
    cos = float(np.sum(got * want)
                / (np.linalg.norm(got) * np.linalg.norm(want) + 1e-30))
    match = float(np.mean(np.argmax(got, -1) == np.argmax(want, -1)))
    print(json.dumps({"gate": "compiled-vs-xla", "cos": round(cos, 6),
                      "top1_match": match}), flush=True)
    assert cos > 0.99, cos

    for name, policy in CONFIGS.items():
        model = resnet50_fused.as_model(scales, policy=policy or None)
        r = scan_throughput(model, vf, x)
        print(json.dumps({"config": name, "img_per_sec": round(r, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
