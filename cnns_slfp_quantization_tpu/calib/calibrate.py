"""Max-abs calibration pass (reference: get_scale_factor,
cifar100_train_eval.py:213-301).

The reference captures full per-layer tensors on the host and reduces max|.|
in torch; here the per-layer maxima are computed *inside* the jitted forward
via the layers' ``capture="absmax"`` sows (scalars only cross the device
boundary), then reduced across batches on the host.

Workflow parity (SURVEY.md §3.3): run the FP32 model (qbit=32) over ~1000
images, collect max|input| / max|weight| / max|output| per quantized layer,
divide by 15.5 (15.0 for ShuffleNetV2) and write the JSON scale file that
models consume.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp

from cnns_slfp_quantization_tpu import calib

_TAG_RE = re.compile(r"^(in|w|out)(\d+)$")


@dataclasses.dataclass
class CalibResult:
    input_absmax: dict[int, float]
    weight_absmax: dict[int, float]
    output_absmax: dict[int, float]

    def ka_max(self) -> list[float]:
        n = max(self.input_absmax) + 1
        return [self.input_absmax.get(i, 1.0) for i in range(n)]

    def kw_max(self) -> list[float]:
        n = max(self.weight_absmax) + 1
        return [self.weight_absmax.get(i, 1.0) for i in range(n)]


def calibrate(
    model,
    variables,
    batches: Iterable,
    *,
    apply_fn: Optional[Callable] = None,
    max_images: int = 1000,
) -> CalibResult:
    """Run forward passes and collect per-layer absmax statistics.

    ``model`` must be constructed with ``capture="absmax"``.  ``batches``
    yields NHWC image arrays (labels ignored if tuples).  Stops after
    ``max_images`` (reference uses 1000, cifar100_train_eval.py:280).
    """
    if apply_fn is None:

        @jax.jit
        def apply_fn(variables, x):
            _, updated = model.apply(
                variables, x, train=False, mutable=["calib"]
            )
            return updated["calib"]

    merged: dict[str, dict[int, float]] = {"in": {}, "w": {}, "out": {}}
    seen = 0
    for batch in batches:
        x = batch[0] if isinstance(batch, (tuple, list)) else batch
        collection = jax.device_get(apply_fn(variables, x))
        for leaf_path, value in _iter_leaves(collection):
            m = _TAG_RE.match(leaf_path)
            if not m:
                continue
            tag, lid = m.group(1), int(m.group(2))
            v = float(jnp.asarray(value).max())
            cur = merged[tag].get(lid)
            merged[tag][lid] = v if cur is None else max(cur, v)
        seen += x.shape[0]
        if seen >= max_images:
            break
    return CalibResult(merged["in"], merged["w"], merged["out"])


def _iter_leaves(tree, prefix=""):
    """Yield (leaf_name, value) for every leaf; name = final dict key."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_leaves(v, k)
    elif isinstance(tree, (tuple, list)):
        for v in tree:
            yield from _iter_leaves(v, prefix)
    else:
        yield prefix, tree


def calibrate_and_save(
    model, variables, batches, name: str, divisor: float = 15.5, **kw
):
    """Full reference workflow: calibrate -> write calib/constants/<name>.json
    (the analog of the max_inout_<net>.txt / max_weight_<net>.txt dumps,
    cifar100_train_eval.py:287-301)."""
    result = calibrate(model, variables, batches, **kw)
    path = calib.save_scales(name, result.ka_max(), result.kw_max(), divisor)
    return result, path
