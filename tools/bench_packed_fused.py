"""Measure the packed+fused serving trade: weight HBM bytes vs throughput.

VERDICT r4 #4: packed (uint8 SLFP codes, 4x less weight HBM) serving now
runs on the fused executors (serve.py).  This records the capacity/
throughput trade for the docs: weight bytes and img/s for float-frozen vs
uint8-packed fused ResNet-50 at the headline batch.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_packed_fused.py
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from cnns_slfp_quantization_tpu.serve import InferenceEngine


def weight_bytes(variables):
    return int(sum(a.size * a.dtype.itemsize
                   for a in jax.tree.leaves(variables["params"])))


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for packed in (False, True):
        eng = InferenceEngine("resnet", qbit=8, batch_size=256,
                              pack_weights=packed, fused=True)
        wb = weight_bytes(eng.variables)
        # correctness spot check before timing
        x = np.random.default_rng(0).normal(
            0, 1, (4, 224, 224, 3)).astype(np.float32)
        logits = eng.predict(x)
        assert np.isfinite(logits).all()
        r = eng.throughput()
        print(json.dumps({
            "config": "packed_fused" if packed else "float_fused",
            "weight_MB": round(wb / 1e6, 2),
            "img_per_sec": round(r, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
