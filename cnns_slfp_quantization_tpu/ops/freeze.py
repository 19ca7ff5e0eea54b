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


def prequantize_variables(model_capture_full, variables, sample_input):
    """Return variables with every quant kernel replaced by Q(kernel/Kw).

    ``model_capture_full`` must be the same architecture constructed with
    ``capture="full"``.  Non-quantized kernels (plain nn.Dense/nn.Conv) are
    left untouched.
    """
    _, inter = model_capture_full.apply(
        variables, sample_input, train=False, mutable=["intermediates"])
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
                    new["kernel"] = jnp.asarray(wq, v["kernel"].dtype)
                    out[k] = new
                else:
                    out[k] = walk(v, cap if isinstance(cap, dict) else {})
            else:
                out[k] = v
        return out

    new_params = walk(variables["params"], inter)
    out = dict(variables)
    out["params"] = new_params
    return out
