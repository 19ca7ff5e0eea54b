"""Calibration: scale-constant storage + max-abs calibration passes.

The reference hard-codes per-layer ``ka``/``kw`` arrays in each model's
constructor (e.g. nets_cifar/mobilenetv1.py:14-19) with the convention
``Ka = max|layer_input| / 15.5`` (15.0 for ShuffleNetV2,
shufflenet_v2.py:141).  Here they are externalized to JSON files under
``calib/constants/`` (seeded from the reference arrays) and re-generatable
via :func:`cnns_slfp_quantization_tpu.calib.calibrate.calibrate`.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import numpy as np

_CONSTANTS_DIR = pathlib.Path(__file__).parent / "constants"


@dataclasses.dataclass(frozen=True)
class ScaleSet:
    """Per-layer quantization scales: ``ka[i] = max|input_i| / divisor``."""

    ka: np.ndarray  # already divided
    kw: np.ndarray
    divisor: float
    source: str = ""

    def __post_init__(self):
        object.__setattr__(self, "ka", np.asarray(self.ka, np.float64))
        object.__setattr__(self, "kw", np.asarray(self.kw, np.float64))

    @staticmethod
    def ones(n: int) -> "ScaleSet":
        return ScaleSet(np.ones(n), np.ones(n), 1.0, "unit")


def load_scales(name: str) -> ScaleSet:
    """Load a named scale set (e.g. "mobilenetv1_cifar") from JSON."""
    return load_scales_path(_CONSTANTS_DIR / f"{name}.json")


def load_scales_path(path) -> ScaleSet:
    """Load a scale-set JSON from an explicit path (e.g. the
    ``--pre_reference`` calibration output under --root_dir/calib/)."""
    path = pathlib.Path(path)
    data = json.loads(path.read_text())
    div = float(data["divisor"])
    return ScaleSet(
        ka=np.asarray(data["ka_max"], np.float64) / div,
        kw=np.asarray(data["kw_max"], np.float64) / div,
        divisor=div,
        source=data.get("source", str(path)),
    )


def save_scales(name: str, ka_max, kw_max, divisor: float,
                source: str = "calibrated", out_dir=None):
    """Write a scale-set JSON.

    ``out_dir=None`` writes into the shipped ``calib/constants/`` package dir
    (for deliberately committing a new constants set); runtime callers (the
    --pre_reference CLI path) must pass an output dir so generated artifacts
    land under --root_dir, not inside the installed package.
    """
    out = _CONSTANTS_DIR if out_dir is None else pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"{name}.json"
    path.write_text(
        json.dumps(
            {
                "source": source,
                "divisor": divisor,
                "ka_max": list(map(float, ka_max)),
                "kw_max": list(map(float, kw_max)),
            },
            indent=1,
        )
        + "\n"
    )
    return path
