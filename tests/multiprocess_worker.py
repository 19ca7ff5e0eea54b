"""Worker process for the 2-process multihost test (SURVEY.md §2.3).

Launched by tests/test_multiprocess.py with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=4: two of these join via
``jax.distributed.initialize`` (8 global devices), build the ('data','model')
mesh through the ACTUAL CLI driver path, and run sharded DSGD SLFP8 QAT
through ``PlacedBatches``'s ``process_count > 1`` branch
(multihost.shard_data_iterator -> multihost.global_batch ->
jax.make_array_from_process_local_data).

Prints one ``RESULT {...}`` JSON line the parent asserts on.
"""

from __future__ import annotations

import argparse
import json
import sys
from types import SimpleNamespace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--root_dir", required=True)
    cfg = ap.parse_args()

    import jax

    jax.distributed.initialize(
        coordinator_address=cfg.coordinator,
        num_processes=cfg.num_processes,
        process_id=cfg.process_id,
    )
    assert jax.process_count() == cfg.num_processes, jax.process_count()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == cfg.num_processes * n_local, (n_global, n_local)

    # 1. global_batch assembly: each host contributes an 8-image local batch;
    #    the global array must be (16, 32, 32, 3) sharded over 'data', and
    #    the ragged 5th batch must be truncated on BOTH hosts (desync guard).
    from cnns_slfp_quantization_tpu.cli import common as cli_common
    from cnns_slfp_quantization_tpu.data import synthetic

    mesh = cli_common.build_mesh(SimpleNamespace(mesh_data=8, mesh_model=1))
    batches = list(synthetic.SyntheticIterator(
        image_size=32, num_classes=100, batch_size=8, num_batches=5, seed=3))
    pb = cli_common.PlacedBatches(batches, mesh)
    assert len(pb) == 2, len(pb)
    shapes = [(tuple(img.shape), tuple(lab.shape)) for img, lab in pb]
    assert shapes == [((16, 32, 32, 3), (16,))] * 2, shapes

    # 2. the full CLI driver, SPMD over both processes: DSGD SLFP8 QAT,
    #    LR schedule + epoch numbering from the wrapped (per-process) length,
    #    multihost-safe --save_state/--save_model (gather + process-0 write).
    from cnns_slfp_quantization_tpu.cli import cifar100_train_eval

    state, accs = cifar100_train_eval.main([
        "--synthetic", "--retrain", "--net", "mobilenet", "--Qbits", "8",
        "--optimizer", "DSGD", "--mesh_data", "8", "--mesh_model", "1",
        "--train_batch_size", "8", "--eval_batch_size", "8",
        "--synthetic_batches", "5", "--max_epochs", "2",
        "--save_state", "--save_model",
        "--root_dir", cfg.root_dir, "--jax_cache", "",
    ])
    print("RESULT " + json.dumps({
        "process_id": cfg.process_id,
        "step": int(state.step),
        "accs": [round(float(a), 6) for a in accs],
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
