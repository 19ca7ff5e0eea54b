"""Inference-time weight freezing: pre-quantize all conv/dense kernels.

The reference (and our QAT path) re-quantizes every weight tensor on every
forward (conv2d_func.py:22) — correct for training, wasted work for
inference/serving.  :func:`prequantize_variables` runs the capture-enabled
model once, pulls each layer's ``weight_q`` (already ``Q(w/Kw)``), and stores
it back into the kernel params.  A model built with ``frozen_weights=True``
then skips the divide+quantize entirely; outputs are bit-identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _map_quant_kernels(model_capture_full, variables, sample_input, fn):
    """Replace every quant-layer kernel with ``fn(weight_q, old_kernel)``."""
    _, inter = jax.jit(
        lambda v, x: model_capture_full.apply(
            v, x, train=False, mutable=["intermediates"])
    )(variables, sample_input)
    inter = inter["intermediates"]

    def walk(params, captured):
        out = {}
        for k, v in params.items():
            cap = captured.get(k) if isinstance(captured, dict) else None
            if isinstance(v, dict):
                if cap is not None and "weight_q" in cap:
                    new = dict(v)
                    wq = cap["weight_q"]
                    wq = wq[0] if isinstance(wq, tuple) else wq
                    new["kernel"] = fn(wq, v["kernel"])
                    out[k] = new
                else:
                    out[k] = walk(v, cap if isinstance(cap, dict) else {})
            else:
                out[k] = v
        return out

    out = dict(variables)
    out["params"] = walk(variables["params"], inter)
    return out


def prequantize_variables(model_capture_full, variables, sample_input,
                          dtype=None):
    """Return variables with every quant kernel replaced by Q(kernel/Kw).

    ``model_capture_full`` must be the same architecture constructed with
    ``capture="full"``.  Non-quantized kernels (plain nn.Dense/nn.Conv) are
    left untouched.  Use with ``frozen_weights=True`` models; outputs are
    bit-identical to the QAT-path forward.

    ``dtype=jnp.bfloat16`` stores the frozen weights in the compute dtype
    directly — identical results to the runtime cast the bf16 conv path
    performs anyway, but skips that per-step convert and halves weight HBM
    traffic.
    """
    return _map_quant_kernels(
        model_capture_full, variables, sample_input,
        lambda wq, old: jnp.asarray(wq, dtype or old.dtype))


def pack_variables(model_capture_full, variables, sample_input):
    """Return variables with every quant kernel stored as uint8 SLFP codes.

    Real 8-bit weight storage (4x less HBM): a ``frozen_weights=True`` model
    decodes codes on use — in VMEM inside the fused Pallas kernels for
    1x1/dense layers, via the jnp decode for spatial convs.  SLFP8 models
    only (the pack targets the SLFP<3,4> code space).
    """
    from cnns_slfp_quantization_tpu.ops import sfp

    return _map_quant_kernels(
        model_capture_full, variables, sample_input,
        lambda wq, old: sfp.pack_slfp34(wq))
