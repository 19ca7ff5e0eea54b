"""Restart-based fault recovery: --save_state / --resume round-trip.

The framework's fault-tolerance story (SURVEY.md §5, extending the
reference's ad-hoc best-ckpt save, cifar100_train_eval.py:316-319): the full
train state (params, BN stats, optimizer momentum/counters, step) is
checkpointed every epoch and a relaunch with ``--resume`` must continue
training *bit-identically* to an uninterrupted run — including the per-epoch
rng key stream and the epoch numbering.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAX_CACHE = "/tmp/jax_test_cache"

COMMON = ["--Qbits", "8", "--net", "mobilenet", "--synthetic", "--retrain",
          "--optimizer", "DSGD", "--lr", "0.01",
          "--train_batch_size", "8", "--eval_batch_size", "8",
          "--save_state", "--jax_cache", JAX_CACHE]


def run_cli(args, cwd) -> str:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-m",
         "cnns_slfp_quantization_tpu.cli.cifar100_train_eval", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"driver failed (rc={proc.returncode})\n"
        f"stdout:\n{proc.stdout[-4000:]}\nstderr:\n{proc.stderr[-4000:]}")
    return proc.stdout


def _flat(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _flat(tree[k], f"{prefix}/{k}")
    else:
        yield prefix, np.asarray(tree)


@pytest.mark.slow
def test_resume_continues_bit_identically(tmp_path):
    from cnns_slfp_quantization_tpu.train import checkpoint

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()

    # uninterrupted 2-epoch run
    run_cli([*COMMON, "--max_epochs", "2", "--root_dir", str(a)], tmp_path)
    # interrupted: 1 epoch, then restart resuming the saved state
    run_cli([*COMMON, "--max_epochs", "1", "--root_dir", str(b)], tmp_path)
    state_b = str(b / "ckpt" / "cifar-100" / "mobilenet0_tmp_state")
    out = run_cli([*COMMON, "--max_epochs", "2", "--root_dir", str(b),
                   "--resume", state_b], tmp_path)
    assert "resumed train state from" in out and "(step 20)" in out, out

    ref = checkpoint.restore(
        str(a / "ckpt" / "cifar-100" / "mobilenet0_tmp_state"))
    got = checkpoint.restore(state_b)
    ref_leaves = list(_flat(ref))
    got_leaves = list(_flat(got))
    assert [k for k, _ in ref_leaves] == [k for k, _ in got_leaves]
    assert int(np.asarray(got["step"])) == 40  # 2 epochs x 20 steps
    for (key, va), (_, vb) in zip(ref_leaves, got_leaves):
        np.testing.assert_array_equal(
            va, vb, err_msg=f"state leaf {key} diverged after resume")
