"""Training / evaluation steps and epoch loops.

Functional re-expression of the reference drivers' train()/test() loops
(cifar100_train_eval.py:162-211, imgnet_train_eval.py:142-216): CE loss,
top-1/top-5 metrics, BatchNorm running-stat updates, samples/sec reporting.
Every step is a single jitted function; the epoch loop is plain Python over
device-resident state.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation):
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros([], jnp.int32),
        )

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def cross_entropy(logits, labels):
    """Mean CE over integer labels (reference: nn.CrossEntropyLoss).

    Computed directly (logsumexp - label logit, the same decomposition
    optax's helper uses, without its chex type-probing — whose error
    path masks the actual offending value under jit).
    """
    logits = logits.astype(jnp.float32)
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, labels[:, None].astype(jnp.int32),
                             axis=-1)[:, 0]
    return jnp.mean(logz - ll)


def make_train_step(model, tx: optax.GradientTransformation,
                    has_dropout: bool = False) -> Callable:
    """Returns jittable ``step(state, images, labels, rng) -> (state, metrics)``."""

    def step(state: TrainState, images, labels, rng):
        def loss_fn(params):
            variables = {"params": params}
            mutable = False  # flax returns a bare output for mutable=False;
            if state.batch_stats:  # [] would still return an (out, {}) tuple
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            rngs = {"dropout": rng} if has_dropout else None
            out = model.apply(variables, images, train=True,
                              mutable=mutable, rngs=rngs)
            logits, updated = out if mutable else (out, {})
            return cross_entropy(logits, labels), (logits, updated)

        (loss, (logits, updated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        new_state = state.replace(
            params=new_params,
            batch_stats=updated.get("batch_stats", state.batch_stats),
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "accuracy": acc}

    return step


def make_eval_step(model) -> Callable:
    """Returns jittable ``eval_step(variables, images, labels) -> metrics``.

    top-1/top-5 correct counts (imgnet_train_eval.py:199-204 semantics).
    """

    def eval_step(variables, images, labels):
        logits = model.apply(variables, images, train=False)
        top5 = jax.lax.top_k(logits, 5)[1]
        correct1 = jnp.sum((jnp.argmax(logits, -1) == labels).astype(jnp.int32))
        correct5 = jnp.sum(jnp.any(top5 == labels[:, None], axis=1).astype(jnp.int32))
        return {"correct1": correct1, "correct5": correct5,
                "count": jnp.asarray(labels.shape[0], jnp.int32)}

    return eval_step


def evaluate(eval_step, variables, batches, max_images: Optional[int] = None):
    """Accumulate top-1/top-5 over an eval set (test(), cifar:196-211).

    ``max_images`` is an exact cap: a final partial batch is sliced so the
    reported image count never overshoots (imgnet_train_eval.py:182-185's
    100-image smoke eval reports exactly 100).
    """
    c1 = c5 = n = 0
    for images, labels in batches:
        if max_images is not None and n + images.shape[0] > max_images:
            keep = max_images - n
            images, labels = images[:keep], labels[:keep]
            if keep == 0:
                break
        m = jax.device_get(eval_step(variables, images, labels))
        c1 += int(m["correct1"]); c5 += int(m["correct5"]); n += int(m["count"])
        if max_images is not None and n >= max_images:
            break
    return {"top1": 100.0 * c1 / max(n, 1), "top5": 100.0 * c5 / max(n, 1),
            "images": n}


def train_epoch(train_step, state, batches, rng, *, log_interval=100,
                log_fn=print, epoch=0):
    """One epoch (train(), cifar100_train_eval.py:162-191): returns state."""
    t0 = time.time()
    seen = 0
    for i, (images, labels) in enumerate(batches):
        rng, sub = jax.random.split(rng)
        state, metrics = train_step(state, images, labels, sub)
        seen += images.shape[0]
        if i % log_interval == 0:
            metrics = jax.device_get(metrics)
            dt = time.time() - t0
            log_fn(
                f"epoch {epoch} step {i} cls_loss={float(metrics['loss']):.5f} "
                f"({seen / max(dt, 1e-9):.0f} samples/sec)")
    return state


def multistep_lr(base_lr: float, milestones=(75, 85, 100), gamma: float = 0.1,
                 steps_per_epoch: int = 1):
    """MultiStepLR equivalent (cifar100_train_eval.py:154)."""
    return optax.piecewise_constant_schedule(
        base_lr, {int(m * steps_per_epoch): gamma for m in milestones})
