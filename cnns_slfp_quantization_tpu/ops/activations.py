"""Activation library (reference: utils/activation_func.py).

- ``stl``: "Soft-Tanh-Log" compressor ``x -> x if |x|<=1 else
  sign(x)*(ln|x|+1)`` with the reference's *custom* backward
  (activation_func.py:14-17).  NB the reference gradient is a function of the
  incoming cotangent only (``where(|g|<=1, 1, 1/|g|) * g``), not of ``x`` —
  a quirk we reproduce exactly for training parity.
- ``swish`` / ``sigmoid`` wrappers (activation_func.py:30-36).
- ``gelu``: exact (erf) form, matching ``torch.nn.GELU()``'s default used by
  the VGG16_gelu variant (nets_cifar/vgg16.py:208).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def stl(x: jax.Array) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax <= 1.0, x, jnp.sign(x) * (jnp.log(ax) + 1.0))


def _stl_fwd(x):
    return stl(x), None


def _stl_bwd(_, g):
    # Reference activation_func.py:16: clip-by-magnitude of the cotangent.
    ag = jnp.abs(g)
    return (jnp.where(ag <= 1.0, 1.0, 1.0 / ag) * g,)


stl.defvjp(_stl_fwd, _stl_bwd)


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def sigmoid(x: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(x)


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def relu(x: jax.Array) -> jax.Array:
    return jax.nn.relu(x)


ACTIVATIONS = {
    "relu": relu,
    "swish": swish,
    "gelu": gelu,
    "sigmoid": sigmoid,
    "stl": stl,
    "identity": lambda x: x,
}


def get(name: str):
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"unknown activation {name!r}") from None
