"""Quantization-aware optimizers as optax transforms (reference:
utils/optimizer.py).

- :func:`dsgd` — "double SGD" (optimizer.py:9-73): after the ordinary
  momentum-SGD update, re-apply the step x2 wherever the SLFP-quantized
  weight did not move (|Q(w_before) - Q(w_after)| < 1e-4), so weights stuck
  inside one quantization bin get a 3x total step.  The paper's revised SGD
  for non-uniform quantization.
- :func:`ssgd` — "scaled SGD" (optimizer.py:75-132): extra step scaled by
  |w|+1 after the ordinary update (larger weights, which sit in wider SLFP
  bins, get proportionally larger pushes).
- :func:`sgd` — NormalSGD (optimizer.py:134-190): plain momentum SGD.

All are pure ``optax.GradientTransformation``s: the conditional logic is
``jnp.where`` (no data-dependent control flow), so a whole DSGD step jits
onto TPU — the reference runs this per-parameter in eager Python on GPU.

The torch conventions reproduced here: weight decay is *added to the
gradient* before momentum (optimizer.py:45-46); momentum buffer update is
``buf = m*buf + (1-dampening)*g`` with ``buf`` initialized to the first
gradient (with dampening=0, equivalent to zero-init accumulation); nesterov
uses ``g + m*buf``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax

from cnns_slfp_quantization_tpu.ops import sfp

ScalarOrSchedule = Union[float, Callable]


class QSGDState(NamedTuple):
    count: jnp.ndarray
    momentum: optax.Updates
    # DSGD update statistics (reference globals.py / optimizer.py:65-66):
    # cumulative number of parameters whose quantized value moved ("updated",
    # scale==0) vs stayed in-bin and got the double step ("stuck", scale==2).
    # None unless track_stats=True.
    stats: Any = None


def _lr_at(lr: ScalarOrSchedule, count):
    return lr(count) if callable(lr) else lr


def _momentum_step(g, p, buf, momentum, dampening, nesterov, weight_decay):
    if weight_decay:
        g = g + weight_decay * p
    if momentum:
        buf = momentum * buf + (1.0 - dampening) * g
        d = g + momentum * buf if nesterov else buf
    else:
        d = g
    return d, buf


def _qsgd(
    lr: ScalarOrSchedule,
    qbit: int,
    momentum: float,
    dampening: float,
    weight_decay: float,
    nesterov: bool,
    rescale,  # fn(p, delta1, quantize) -> extra scale array (0 => no extra step)
    track_stats: bool = False,
) -> optax.GradientTransformation:
    quantize = lambda w: sfp.quantize_weight(w, qbit)

    def init(params):
        stats = (
            {"updated": jnp.zeros([], jnp.float32),
             "stuck": jnp.zeros([], jnp.float32)}
            if track_stats else None)
        return QSGDState(
            count=jnp.zeros([], jnp.int32),
            momentum=jax.tree.map(jnp.zeros_like, params),
            stats=stats,
        )

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("DSGD/SSGD require params (optax update(..., params=params))")
        lr_t = _lr_at(lr, state.count)

        def per_param(g, p, buf):
            d, new_buf = _momentum_step(
                g, p, buf, momentum, dampening, nesterov, weight_decay)
            delta1 = -lr_t * d  # the ordinary SGD update (optimizer.py:59)
            scale = rescale(p, delta1, quantize)
            return delta1 * (1.0 + scale), new_buf, scale

        is_triple = lambda t: isinstance(t, tuple) and len(t) == 3
        flat = jax.tree.map(per_param, updates, params, state.momentum)
        new_updates = jax.tree.map(lambda t: t[0], flat, is_leaf=is_triple)
        new_momentum = jax.tree.map(lambda t: t[1], flat, is_leaf=is_triple)
        stats = state.stats
        if track_stats:
            scales = jax.tree.leaves(
                jax.tree.map(lambda t: t[2], flat, is_leaf=is_triple))
            updated = sum(jnp.sum((s == 0.0).astype(jnp.float32)) for s in scales)
            stuck = sum(jnp.sum((s == 2.0).astype(jnp.float32)) for s in scales)
            stats = {"updated": state.stats["updated"] + updated,
                     "stuck": state.stats["stuck"] + stuck}
        return new_updates, QSGDState(state.count + 1, new_momentum, stats)

    return optax.GradientTransformation(init, update)


def dsgd(
    lr: ScalarOrSchedule,
    qbit: int,
    momentum: float = 0.9,
    dampening: float = 0.0,
    weight_decay: float = 5e-4,
    nesterov: bool = False,
    tol: float = 1e-4,
    track_stats: bool = False,
) -> optax.GradientTransformation:
    """DSGD: 2x extra step where the quantized weight didn't move
    (optimizer.py:58-64; tolerance 1e-4 at :62-63).

    ``track_stats=True`` accumulates the updated/stuck parameter counts the
    reference tallies in globals.py (commented at optimizer.py:65-66) into
    the optimizer state.
    """

    def rescale(p, delta1, quantize):
        moved = jnp.abs(quantize(p) - quantize(p + delta1))
        return jnp.where(moved < tol, 2.0, 0.0)

    return _qsgd(lr, qbit, momentum, dampening, weight_decay, nesterov,
                 rescale, track_stats=track_stats)


def ssgd(
    lr: ScalarOrSchedule,
    qbit: int,
    momentum: float = 0.9,
    dampening: float = 0.0,
    weight_decay: float = 5e-4,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """SSGD: extra step scaled by |w_after| + 1 (optimizer.py:127-131).

    The reference computes Q(w) before/after too but never uses them (:127,
    :129 — dead code); only the magnitude scaling matters.  ``qbit`` is kept
    for CLI parity.
    """

    def rescale(p, delta1, quantize):
        del quantize
        return jnp.abs(p + delta1) + 1.0

    return _qsgd(lr, qbit, momentum, dampening, weight_decay, nesterov, rescale)


def sgd(
    lr: ScalarOrSchedule,
    momentum: float = 0.9,
    dampening: float = 0.0,
    weight_decay: float = 5e-4,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """Plain torch-style momentum SGD (NormalSGD, optimizer.py:134-190)."""
    return _qsgd(lr, 32, momentum, dampening, weight_decay, nesterov,
                 lambda p, d, q: 0.0)


def create_optimizer(
    name: str, lr: ScalarOrSchedule, qbit: int = 32,
    momentum: float = 0.9, weight_decay: float = 5e-4,
) -> optax.GradientTransformation:
    """By reference driver name (cifar100_train_eval.py:137-152)."""
    key = name.lower()
    if key == "dsgd":
        return dsgd(lr, qbit, momentum=momentum, weight_decay=weight_decay)
    if key == "ssgd":
        return ssgd(lr, qbit, momentum=momentum, weight_decay=weight_decay)
    if key in ("sgd", "normalsgd"):
        return sgd(lr, momentum=momentum, weight_decay=weight_decay)
    if key == "adam":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if key == "rmsprop":
        return optax.rmsprop(lr, decay=0.99, eps=1e-8)
    raise ValueError(f"unknown optimizer {name!r}")
