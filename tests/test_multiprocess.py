"""Two REAL processes through the multihost stack (SURVEY.md §2.3).

The virtual-mesh tests exercise the sharding layout single-process; this one
runs the only remaining multi-process-specific code paths for real:
``jax.distributed.initialize`` (parallel/multihost.py:23-36), the
``process_count > 1`` branch of ``PlacedBatches`` (cli/common.py),
``multihost.shard_data_iterator`` truncation, ``multihost.global_batch`` /
``jax.make_array_from_process_local_data``, and the gathered process-0
checkpoint write (cli/common.py ``_save_gathered``).

Both workers must produce bit-identical eval accuracies (same SPMD program)
and train exactly 2 global steps/epoch from the 5-batch local stream
(5 // 2 = 2, ragged tail truncated identically on both hosts).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cpu_training(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multiprocess_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # drop the axon sitecustomize preload
    env.update(
        PYTHONPATH=repo,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    root = tmp_path / "shared"
    root.mkdir()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, worker,
             "--coordinator", f"localhost:{port}",
             "--process_id", str(pid),
             "--root_dir", str(root)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = {}
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-4000:]
        r = json.loads(lines[-1][len("RESULT "):])
        results[r["process_id"]] = r

    assert set(results) == {0, 1}
    # 5 local batches, 2 processes -> 2 global steps/epoch, 2 epochs
    assert results[0]["step"] == 4, results
    assert results[1]["step"] == 4, results
    # the SPMD program is identical on both hosts -> identical eval accuracy
    assert results[0]["accs"] == results[1]["accs"], results
    assert len(results[0]["accs"]) == 2

    # gathered checkpoint written through the all-process orbax save
    # (_save_gathered: gather -> every process calls save -> primary writes)
    ckpt = tmp_path / "shared" / "ckpt" / "cifar-100"
    state_dirs = list(ckpt.glob("*_state"))
    assert state_dirs, list(ckpt.iterdir())
    assert (state_dirs[0] / "_METADATA").exists() or any(
        state_dirs[0].iterdir()), "state checkpoint is empty"
    # sidecar metadata uses the wrapped (global) steps_per_epoch
    meta = json.loads((ckpt / (state_dirs[0].name + ".meta.json")).read_text())
    assert meta["steps_per_epoch"] == 2, meta
