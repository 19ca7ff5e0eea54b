"""A/B XLA TPU compiler flags on the headline bench configuration.

The round-3 attribution (docs/DESIGN.md) showed the remaining gap to the
no-quant ceiling is VPU time of quantize chains riding conv epilogues.
Flags that change fusion/scheduling headroom are the remaining compiler-side
lever; each child run measures the fused SLFP8 ResNet-50 exactly like
bench.py and prints one JSON line.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_xla_flags.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CONFIGS = {
    "baseline": "",
    # more scoped VMEM for fusions (default 16MB-ish budget split; raising it
    # lets bigger epilogue fusions stay in VMEM)
    "vmem_128m": "--xla_tpu_scoped_vmem_limit_kib=131072",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    # flip multi-output fusion heuristics (round-3 producer-fusion failure
    # was XLA duplicating the conv; these change that cost model)
    "no_multioutput": "--xla_tpu_enable_multioutput_fusion=false",
}

CHILD = r"""
import json, sys
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_flags")
from cnns_slfp_quantization_tpu import calib, models
from cnns_slfp_quantization_tpu.models import resnet50_fused
from cnns_slfp_quantization_tpu.ops import freeze
from cnns_slfp_quantization_tpu.utils.profiling import scan_throughput

batch = 256
x = jax.random.normal(jax.random.PRNGKey(0), (batch, 224, 224, 3), jnp.float32)
init_model = models.create_model("resnet", 8)
v = init_model.init(jax.random.PRNGKey(1), x[:1], train=False)
cap = models.create_model("resnet", 8, capture="full")
vf = freeze.prequantize_variables(cap, v, x[:1], dtype=jnp.bfloat16)
model = resnet50_fused.as_model(calib.load_scales("resnet50_imgnet"))
print(json.dumps({"img_per_sec": round(scan_throughput(model, vf, x), 1)}))
"""


def main():
    for name, flags in CONFIGS.items():
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (base + " " + flags).strip()
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True, timeout=1800)
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(json.dumps({"config": name, "flags": flags,
                          "result": json.loads(line[-1]) if line else None,
                          "rc": r.returncode,
                          "err": r.stderr[-300:] if r.returncode else ""}),
              flush=True)


if __name__ == "__main__":
    main()
