"""Validate every layer's ``nonneg_input`` hint against actual model
dataflow: a wrongly-True hint would make the fast bf16 quantizer treat
negative inputs as (pseudo-)zeros.  Structural guarantee: ReLU/maxpool/
concat/shuffle preserve nonnegativity regardless of weights, so random
weights suffice."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnns_slfp_quantization_tpu import models

_CASES = [
    ("mobilenet", 32), ("mobilenet_swish", 32), ("shufflenetv2", 32),
    ("vgg16", 32), ("vgg16_gelu", 32),
    ("mobilenetv1", 64), ("resnet", 64), ("alexnet", 224), ("squeezenet", 64),
]


def _iter_captures(tree, path=()):
    if isinstance(tree, dict):
        if "nonneg_hint" in tree:
            yield path, tree
        else:
            for k, v in tree.items():
                yield from _iter_captures(v, path + (k,))


@pytest.mark.parametrize("name,size", _CASES)
def test_nonneg_hints_match_dataflow(name, size):
    # alexnet needs the full 224 input (hard-coded 256*6*6 flatten)
    model = models.create_model(name, 8, capture="full")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, size, size, 3))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    _, state = jax.jit(lambda v, xx: model.apply(
        v, xx, train=False, mutable=["intermediates"]))(variables, x)
    checked = 0
    for path, cap in _iter_captures(state["intermediates"]):
        hint = bool(np.asarray(cap["nonneg_hint"][0]))
        raw_min = float(np.min(np.asarray(cap["input_raw"][0], np.float32)))
        if hint:
            assert raw_min >= 0, (
                f"{name} layer {'/'.join(path)} claims nonneg_input but "
                f"saw min={raw_min}")
        checked += 1
    assert checked > 0
