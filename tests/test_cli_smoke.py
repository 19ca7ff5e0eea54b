"""End-to-end subprocess smoke tests for the CLI drivers (C16/C17).

The in-process suites (test_train_stack.py) exercise the loop/calibration
functions; these run the actual ``python -m ...cli.<driver>`` entry points —
the reference's public interface (README.md:19) — through argparse, runtime
config, synthetic data, train/eval, and calibration file dumps.

Each runs in a clean subprocess pinned to the CPU backend (the axon
sitecustomize is stripped from PYTHONPATH) so the suite stays TPU-free.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# shared across runs (and with conftest's in-process cache): the smokes are
# compile-dominated, a per-tmp_path cache would be cold every invocation
JAX_CACHE = "/tmp/jax_test_cache"


def run_cli(module: str, args: list[str], cwd) -> str:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # drop the axon sitecustomize -> no TPU relay
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-m", module, *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"{module} {' '.join(args)} failed (rc={proc.returncode})\n"
        f"stdout:\n{proc.stdout[-4000:]}\nstderr:\n{proc.stderr[-4000:]}")
    return proc.stdout


@pytest.mark.slow
def test_cifar_driver_qat_epoch(tmp_path):
    """One synthetic SLFP8 QAT epoch: DSGD + eval + best-ckpt save."""
    out = run_cli(
        "cnns_slfp_quantization_tpu.cli.cifar100_train_eval",
        ["--Qbits", "8", "--net", "mobilenet", "--synthetic", "--retrain",
         "--optimizer", "DSGD", "--lr", "0.01", "--max_epochs", "1",
         "--train_batch_size", "8", "--eval_batch_size", "8",
         "--save_model", "--root_dir", str(tmp_path),
         "--jax_cache", JAX_CACHE],
        tmp_path)
    assert "Precision@1" in out and "Precision@5" in out
    assert "saving model" in out  # best-acc checkpoint path taken
    ckpts = [p for p in (tmp_path / "ckpt").rglob("*") if p.is_file()]
    assert ckpts, "no checkpoint files written under --save_model"
    logs = list((tmp_path / "logs").rglob("*.jsonl"))
    assert logs, "MetricLogger wrote no JSONL scalars"
    text = logs[0].read_text()
    assert "Precision@1" in text and "epoch_time" in text


@pytest.mark.slow
def test_cifar_driver_pre_reference_calibration(tmp_path):
    """--pre_reference dumps max_inout/max_weight txt + calibrated JSON
    (reference cifar100_train_eval.py:279-301 workflow)."""
    out = run_cli(
        "cnns_slfp_quantization_tpu.cli.cifar100_train_eval",
        ["--pre_reference", "--net", "mobilenet", "--synthetic",
         "--eval_batch_size", "8", "--root_dir", str(tmp_path),
         "--jax_cache", JAX_CACHE],
        tmp_path)
    assert "Results saved to max_weight_mobilenet.txt" in out
    inout = (tmp_path / "max_inout_mobilenet.txt").read_text()
    weight = (tmp_path / "max_weight_mobilenet.txt").read_text()
    assert "Max Absolute Input" in inout and "Max Absolute weight" in weight
    # mobilenet CIFAR has 28 quantized layers (27 convs + fc)
    assert weight.count("Max Absolute weight") >= 28
    # calibrated JSON lands under --root_dir, never inside the package
    assert (tmp_path / "calib" / "mobilenet_calibrated.json").is_file()
    pkg_constants = os.path.join(
        REPO, "cnns_slfp_quantization_tpu", "calib", "constants")
    assert not os.path.exists(
        os.path.join(pkg_constants, "mobilenet_calibrated.json")), \
        "calibration polluted the package source tree"


@pytest.mark.slow
def test_imgnet_driver_smoke_validate(tmp_path):
    """ImageNet driver default = 100-image smoke eval (not --all_validate),
    mirroring imgnet_train_eval.py:182-185."""
    out = run_cli(
        "cnns_slfp_quantization_tpu.cli.imgnet_train_eval",
        ["--Qbits", "8", "--net", "mobilenetv1", "--synthetic",
         "--max_epochs", "1", "--eval_batch_size", "10",
         "--root_dir", str(tmp_path),
         "--jax_cache", JAX_CACHE],
        tmp_path)
    assert "Precision@1" in out and "Precision@5" in out
    assert "(100 images)" in out  # smoke-eval cap applied
