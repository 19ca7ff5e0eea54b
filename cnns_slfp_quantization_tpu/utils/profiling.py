"""Profiling / tracing utilities (SURVEY.md §5: jax.profiler + step timing).

- :class:`StepTimer`: wall-clock samples/sec like the reference train loop
  prints (cifar100_train_eval.py:183-187), plus percentile summaries.
- :func:`trace`: context manager around ``jax.profiler`` xplane dumps for
  offline analysis (tensorboard-compatible).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


class StepTimer:
    def __init__(self):
        self.samples: list[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, items: int = 1):
        dt = time.perf_counter() - self._t0
        self.samples.append(dt / max(items, 1))
        return dt

    def summary(self) -> dict:
        if not self.samples:
            return {}
        a = np.asarray(self.samples)
        return {
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p95_s": float(np.percentile(a, 95)),
            "best_s": float(a.min()),
            "items_per_sec": float(1.0 / a.min()),
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a jax.profiler trace (xplane) around the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def scan_throughput(model, variables, x0, *, steps: int = 16) -> float:
    """items/sec over `steps` forward passes chained inside one jitted
    lax.scan, fetched as a host scalar.

    This is the only timing method the axon relay can't fake:
    block_until_ready on remote arrays can return before execution, and deep
    async dispatch queues stall the relay (.claude/skills/verify/SKILL.md).
    The per-step input perturbation stops XLA from CSE-ing the
    loop-invariant forward.
    """
    import jax.numpy as jnp

    @jax.jit
    def run(variables, x0):
        def body(acc, i):
            perturbed = (x0.astype(jnp.float32)
                         * (1.0 + i.astype(jnp.float32) * 1e-6)).astype(x0.dtype)
            y = model.apply(variables, perturbed, train=False)
            return acc + jnp.sum(y.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return acc

    float(run(variables, x0))  # compile + warm
    best = float("inf")
    for _ in range(3):  # best-of-3: the relay adds multi-ms jitter
        t0 = time.perf_counter()
        float(run(variables, x0))
        best = min(best, time.perf_counter() - t0)
    return x0.shape[0] * steps / best


def scan_train_throughput(train_step, state, x0, y0, *, steps: int = 8,
                          rng=None) -> float:
    """QAT-step counterpart of :func:`scan_throughput`: images/sec over
    `steps` full train steps (fwd + bwd + optimizer) chained in one jitted
    lax.scan, relay-proof via the host scalar fetch."""
    import jax.numpy as jnp

    if rng is None:
        rng = jax.random.PRNGKey(0)

    @jax.jit
    def run(state, x0, y0, rng):
        def body(carry, i):
            st, acc = carry
            perturbed = (x0.astype(jnp.float32)
                         * (1.0 + i.astype(jnp.float32) * 1e-6)).astype(x0.dtype)
            st, metrics = train_step(st, perturbed, y0, rng)
            return (st, acc + metrics["loss"].astype(jnp.float32)), None

        (st, acc), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(steps))
        return acc

    float(run(state, x0, y0, rng))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(state, x0, y0, rng))
        best = min(best, time.perf_counter() - t0)
    return x0.shape[0] * steps / best
