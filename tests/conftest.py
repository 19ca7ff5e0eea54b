"""Test harness: force a virtual 8-device CPU backend.

This image preloads jax via an axon sitecustomize (PYTHONPATH=/root/.axon_site)
and pins JAX_PLATFORMS=axon, which routes every op through a single real TPU
tunnel — far too slow for a unit-test suite and wrong for multi-device
sharding tests.  Since jax is already imported (and the axon backend already
initialized) by the time any conftest runs, switch in-process: update the
platform config, set --xla_force_host_platform_device_count=8 (the standard
JAX fake-backend trick, SURVEY.md §4e) and clear the initialized backends so
the next lookup builds the 8-device CPU client.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
from jax.extend import backend as _jexb  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_jexb.clear_backends()

# Persistent compilation cache: the suite is compile-dominated (whole-model
# jits at several batch sizes); caching compiled executables across runs cuts
# a full re-run from ~13 min to ~2 min.
os.makedirs("/tmp/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu"
