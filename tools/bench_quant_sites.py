"""Attribute the SLFP8 quantize overhead to individual executor sites.

BENCH r2: fused executor 9716 img/s, quantize-disabled ceiling 11753 — the
quantize chain costs ~17%.  This tool disables one activation-quantize site
at a time (quant_sites knob in resnet50_fused.fused_apply) and measures the
throughput delta each is worth, so optimization goes where the time is.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_quant_sites.py
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

ALL = frozenset({"stem", "blockin", "c1out", "c2out", "c3out", "head"})


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=16)
    cfg = p.parse_args()

    x1 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    init_model = models.create_model("resnet", 8)
    v = init_model.init(jax.random.PRNGKey(1), x1, train=False)
    cap = models.create_model("resnet", 8, capture="full")
    vf = freeze.prequantize_variables(cap, v, x1, dtype=jnp.bfloat16)
    scales = calib.load_scales("resnet50_imgnet")
    x = jax.random.normal(jax.random.PRNGKey(0), (cfg.batch, 224, 224, 3),
                          jnp.float32)

    def measure(sites, label):
        model = resnet50_fused.as_model(scales, _diag_quant_sites=sites)
        r = scan_throughput(model, vf, x, steps=cfg.steps)
        print(json.dumps({"config": label, "img_per_sec": round(r, 1)}),
              flush=True)
        return r

    measure(None, "all (baseline)")
    for site in sorted(ALL):
        measure(ALL - {site}, f"without {site}")
    measure(frozenset(), "none (ceiling)")


if __name__ == "__main__":
    main()
