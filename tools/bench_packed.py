"""End-to-end A/B of the uint8-packed serving path (VERDICT r2 item 3).

Measures SLFP8 ResNet-50 fused-executor throughput on the real chip at
several batch sizes, for:

  float         : bf16 frozen weights, all-XLA executor (bench.py config)
  packed-xla    : uint8 SLFP codes, jnp decode before every XLA conv
  packed-pallas : uint8 codes, VMEM decode inside the Pallas qmm kernels
                  for 1x1 convs (conv1+conv3), jnp decode for spatial convs

The packed claim to validate: 4x less weight HBM should win where weight
traffic dominates (small batch / latency serving).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_packed.py
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cnns_slfp_quantization_tpu import calib, models  # noqa: E402
from cnns_slfp_quantization_tpu.models import resnet50_fused  # noqa: E402
from cnns_slfp_quantization_tpu.ops import freeze  # noqa: E402
from cnns_slfp_quantization_tpu.utils.profiling import scan_throughput  # noqa: E402

PALLAS = {"conv1": "pallas", "conv3": "pallas"}
XLA = {"conv1": "xla", "conv3": "xla"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[8, 32, 256])
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--configs", nargs="+",
                   default=["float", "packed-xla", "packed-pallas"])
    cfg = p.parse_args()

    x1 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    init_model = models.create_model("resnet", 8)
    v = init_model.init(jax.random.PRNGKey(1), x1, train=False)
    cap = models.create_model("resnet", 8, capture="full")
    v_float = freeze.prequantize_variables(cap, v, x1, dtype=jnp.bfloat16)
    v_packed = freeze.pack_variables(cap, v, x1)
    scales = calib.load_scales("resnet50_imgnet")

    variants = {
        "float": (v_float, XLA),
        "packed-xla": (v_packed, XLA),
        "packed-pallas": (v_packed, PALLAS),
    }

    for batch in cfg.batches:
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, 224, 224, 3),
                              jnp.float32)
        row = {"batch": batch}
        for name in cfg.configs:
            vv, pol = variants[name]
            model = resnet50_fused.as_model(scales, policy=pol)
            row[name] = round(scan_throughput(model, vv, x,
                                              steps=cfg.steps), 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
