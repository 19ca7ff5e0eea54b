"""A/B XLA TPU compiler options on the headline bench configuration.

The round-3 attribution (docs/DESIGN.md) showed the remaining gap to the
no-quant ceiling is VPU time of quantize chains riding conv epilogues; the
ceiling itself is HBM-bound conv time.  Compiler-side fusion/scheduling
headroom is probed here.

NOTE env-var ``XLA_FLAGS`` is unusable through the axon tunnel: the local
jaxlib's parse_flags_from_env aborts on TPU-only flag names (measured:
``Unknown flag in XLA_FLAGS: --xla_tpu_scoped_vmem_limit_kib``).  The
per-compile route works instead: ``jit(f).lower(...).compile(
compiler_options={...})`` ships the options to the server-side TPU
compiler.  Unknown options there raise per-config and are recorded, not
fatal.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_xla_flags.py
Results table: docs/DESIGN.md (round 5).
"""

from __future__ import annotations

import json
import time

CONFIGS = {
    "baseline": None,
    # scoped-VMEM budget for fusions: more lets bigger epilogue fusions stay
    # resident; too much hurts pipelining depth
    "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_128m": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    # flip multi-output fusion heuristics (round-3 producer-fusion failure
    # was XLA duplicating the conv; these change that cost model)
    "no_multioutput": {"xla_tpu_enable_multioutput_fusion": "false"},
    # read-write-bundle fusion off (changes how epilogue chains bundle)
    "no_rwb_fusion": {"xla_tpu_rwb_fusion": "false"},
    # aggressive flag: let the scheduler rerun for better overlap
    "lhs_rerun": {"xla_latency_hiding_scheduler_rerun": "2"},
}

STEPS = 16


def measure(compiler_options):
    import jax
    import jax.numpy as jnp

    from cnns_slfp_quantization_tpu import calib, models
    from cnns_slfp_quantization_tpu.models import resnet50_fused
    from cnns_slfp_quantization_tpu.ops import freeze

    batch = 256
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 224, 224, 3),
                          jnp.float32)
    init_model = models.create_model("resnet", 8)
    v = init_model.init(jax.random.PRNGKey(1), x[:1], train=False)
    cap = models.create_model("resnet", 8, capture="full")
    vf = freeze.prequantize_variables(cap, v, x[:1], dtype=jnp.bfloat16)
    model = resnet50_fused.as_model(calib.load_scales("resnet50_imgnet"))

    def run(variables, x0):
        def body(acc, i):
            perturbed = (x0 * (1.0 + i.astype(jnp.float32) * 1e-6))
            y = model.apply(variables, perturbed, train=False)
            return acc + jnp.sum(y.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
        return acc

    lowered = jax.jit(run).lower(vf, x)
    compiled = (lowered.compile(compiler_options=compiler_options)
                if compiler_options else lowered.compile())
    float(compiled(vf, x))  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(compiled(vf, x))
        best = min(best, time.perf_counter() - t0)
    return round(batch * STEPS / best, 1)


def main():
    for name, opts in CONFIGS.items():
        try:
            r = {"config": name, "options": opts,
                 "img_per_sec": measure(opts)}
        except Exception as e:  # unknown option names raise server-side
            r = {"config": name, "options": opts,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
