"""ctypes bindings for the native host runtime (native/slfp_native.cpp).

Auto-builds the shared library with ``make -C native`` on first use if the
toolchain is available; all callers must handle ``available() == False``
(pure-Python fallbacks exist everywhere).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libslfp_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    i64, f32p, u8p, u64 = (ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                           ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64)
    lib.slfp34_pack.argtypes = [f32p, u8p, i64]
    lib.slfp34_unpack.argtypes = [u8p, f32p, i64]
    lib.slfp34_quantize_act.argtypes = [f32p, f32p, i64]
    lib.absmax.argtypes = [f32p, i64]
    lib.absmax.restype = ctypes.c_float
    lib.cifar_augment.argtypes = [u8p, f32p, i64, f32p, f32p,
                                  ctypes.c_int, u64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _up(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def slfp34_pack(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape, np.uint8)
    lib.slfp34_pack(_fp(x), _up(out), x.size)
    return out


def slfp34_unpack(codes: np.ndarray) -> np.ndarray:
    lib = _load()
    codes = np.ascontiguousarray(codes, np.uint8)
    out = np.empty(codes.shape, np.float32)
    lib.slfp34_unpack(_up(codes), _fp(out), codes.size)
    return out


def slfp34_quantize_act(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape, np.float32)
    lib.slfp34_quantize_act(_fp(x), _fp(out), x.size)
    return out


def absmax(x: np.ndarray) -> float:
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    return float(lib.absmax(_fp(x), x.size))


def cifar_augment(images_u8: np.ndarray, mean, std, *, train: bool,
                  seed: int) -> np.ndarray:
    lib = _load()
    images_u8 = np.ascontiguousarray(images_u8, np.uint8)
    n = images_u8.shape[0]
    out = np.empty((n, 32, 32, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.cifar_augment(_up(images_u8), _fp(out), n, _fp(mean), _fp(std),
                      1 if train else 0, seed & 0xFFFFFFFFFFFFFFFF)
    return out
