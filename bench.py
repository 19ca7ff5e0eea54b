"""Headline benchmark: SLFP8 ResNet-50 ImageNet inference throughput.

Prints ONE JSON line:
  {"metric": "resnet50_slfp8_images_per_sec_per_chip", "value": N,
   "unit": "images/sec/chip", "vs_baseline": R}

``vs_baseline`` is the SLFP8 throughput relative to the same-hardware FP32
ResNet-50 (the reference publishes no throughput numbers — SURVEY.md §6 — so
the meaningful baseline is "quantization must not cost throughput";
R >= 1.0 means the quantized path is at least as fast as FP32).

Timing method: K forward passes chained inside one jitted ``lax.scan`` whose
carry accumulates a scalar from every output, fetched to host at the end —
the only timing the axon relay can't fake (block_until_ready on remote
arrays returns before execution completes, and deep async dispatch queues
stall the relay; see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


from cnns_slfp_quantization_tpu.utils.profiling import scan_throughput  # noqa: E402


def main():
    from cnns_slfp_quantization_tpu import calib, models
    from cnns_slfp_quantization_tpu.models import resnet50_fused
    from cnns_slfp_quantization_tpu.ops import freeze

    batch = 256
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 224, 224, 3), jnp.float32)

    results = {}
    for tag, qbit in (("slfp8", 8), ("fp32", 32)):
        if qbit == 8:
            # inference config: the fused serving executor (BN folded into
            # the Ka*Kw affine, stage-boundary quantize shared between conv1
            # and downsample, bf16 stream) over offline-quantized weights —
            # +8% over the module path, which itself A/B'd faster than the
            # Pallas 1x1 kernels at these shapes (docs/DESIGN.md).
            init_model = models.create_model("resnet", 8)
            variables = init_model.init(jax.random.PRNGKey(1), x[:1], train=False)
            cap = models.create_model("resnet", 8, capture="full")
            variables = freeze.prequantize_variables(cap, variables, x[:1],
                                                     dtype=jnp.bfloat16)
            model = resnet50_fused.as_model(calib.load_scales("resnet50_imgnet"))
        else:
            model = models.create_model("resnet", 32)
            variables = model.init(jax.random.PRNGKey(1), x[:1], train=False)
        results[tag] = scan_throughput(model, variables, x)

    print(json.dumps({
        "metric": "resnet50_slfp8_images_per_sec_per_chip",
        "value": round(results["slfp8"], 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(results["slfp8"] / results["fp32"], 3),
    }))


if __name__ == "__main__":
    main()
