"""A/B the block-input quantize placement.

tools/bench_quant_sites.py attributed ~10% of the SLFP8 ResNet-50 forward
to the standalone block-input quantize pass.  Modes measured:

- consumer (production): standalone fused scale+quantize pass
- producer: raw + quantized expressed as chains on the conv3 output so XLA
  can multi-output-fuse them into the conv epilogue (round 3: XLA
  duplicates the conv instead, 7831 vs 9593)
- pallas_dual (round-4 lever A): hand dual-output Pallas epilogue — read
  the materialized conv3 output once, write raw bf16 + quantized bf16
- packed (round-4 lever B): the standalone pass emits uint8 SLFP codes
  (half the write), decoded to bf16 before the consumer conv

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_blockin.py
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cnns_slfp_quantization_tpu import calib, models  # noqa: E402
from cnns_slfp_quantization_tpu.models import resnet50_fused  # noqa: E402
from cnns_slfp_quantization_tpu.ops import freeze  # noqa: E402
from cnns_slfp_quantization_tpu.utils.profiling import scan_throughput  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--modes", nargs="+",
                   default=["consumer", "pallas_dual", "packed"])
    cfg = p.parse_args()

    x1 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    init_model = models.create_model("resnet", 8)
    v = init_model.init(jax.random.PRNGKey(1), x1, train=False)
    cap = models.create_model("resnet", 8, capture="full")
    vf = freeze.prequantize_variables(cap, v, x1, dtype=jnp.bfloat16)
    scales = calib.load_scales("resnet50_imgnet")
    x = jax.random.normal(jax.random.PRNGKey(0), (cfg.batch, 224, 224, 3),
                          jnp.float32)

    outs = {}
    for mode in cfg.modes:
        model = resnet50_fused.as_model(scales, _diag_blockin_fuse=mode)
        r = scan_throughput(model, vf, x, steps=cfg.steps)
        # correctness guard: logits match the production placement
        outs[mode] = np.asarray(jax.jit(
            lambda v, xx: model.apply(v, xx, train=False))(vf, x[:2]),
            np.float32)
        print(json.dumps({"blockin_fuse": mode, "img_per_sec": round(r, 1)}),
              flush=True)
    base = outs.get("consumer")
    for mode, got in outs.items():
        if base is None or mode == "consumer":
            continue
        same = bool(np.array_equal(base, got))
        # packed decodes the pseudo-zero code to 0.0 instead of 1e-10 and
        # pallas_dual is bit-exact; report both identity and max delta
        print(json.dumps({
            "mode": mode, "outputs_bit_identical": same,
            "max_abs_delta": float(np.max(np.abs(base - got)))}), flush=True)


if __name__ == "__main__":
    main()
