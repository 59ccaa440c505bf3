"""ctypes bindings for the native host runtime (native/evflow_host.cpp).

Auto-builds ``libevflow_host.so`` on first use if a toolchain is present;
all entry points degrade to the numpy implementations in
``evflow.data.encodings`` when the library is unavailable, so the framework
never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["load", "available", "NativeEncoder", "lif_forward"]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libevflow_host.so")

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    i64 = ctypes.c_int64
    lib.ev_count_encoding.argtypes = [_f32p, _f32p, _f32p, i64, i64, i64, _f32p]
    lib.ev_voxel_encoding.argtypes = [
        _f32p, _f32p, _f32p, _f32p, i64, i64, i64, i64, ctypes.c_int, _f32p
    ]
    lib.ev_mask_encoding.argtypes = [_f32p, _f32p, _f32p, i64, i64, i64, _f32p]
    lib.ev_image.argtypes = [_f32p, _f32p, _f32p, i64, i64, i64, _f32p]
    lib.ev_polarity_mask.argtypes = [_f32p, i64, _f32p]
    lib.lif_forward.argtypes = [_f32p, _f32p, _f32p, _f32p, i64, i64, _f32p, _f32p]
    lib.ev_normalize_ts.argtypes = [_f64p, i64]
    lib.ev_normalize_ts.restype = ctypes.c_double
    return lib


def load(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH) and build:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], capture_output=True, timeout=120,
                check=True,
            )
        except Exception:
            return None
    if os.path.exists(_SO_PATH):
        try:
            _LIB = _bind(ctypes.CDLL(_SO_PATH))
        except Exception:
            _LIB = None
    return _LIB


def available() -> bool:
    return load() is not None


def _c(a, dtype=np.float32):
    return np.ascontiguousarray(a, dtype=dtype)


class NativeEncoder:
    """Drop-in provider of the host event encodings (numpy in/out)."""

    def __init__(self):
        self.lib = load()
        if self.lib is None:
            raise RuntimeError("native library unavailable; use evflow.data.encodings")

    def count_encoding(self, xs, ys, ps, sensor_size):
        H, W = int(sensor_size[0]), int(sensor_size[1])
        out = np.zeros((H, W, 2), np.float32)
        self.lib.ev_count_encoding(_c(xs), _c(ys), _c(ps), len(xs), H, W, out)
        return out

    def voxel_encoding(self, xs, ys, ts, ps, num_bins, sensor_size, round_ts=False):
        H, W = int(sensor_size[0]), int(sensor_size[1])
        out = np.zeros((H, W, num_bins), np.float32)
        self.lib.ev_voxel_encoding(
            _c(xs), _c(ys), _c(ts), _c(ps), len(xs), num_bins, H, W,
            int(round_ts), out,
        )
        return out

    def mask_encoding(self, xs, ys, ps, sensor_size):
        H, W = int(sensor_size[0]), int(sensor_size[1])
        out = np.zeros((H, W), np.float32)
        self.lib.ev_mask_encoding(_c(xs), _c(ys), _c(ps), len(xs), H, W, out)
        return out[..., None]

    def image(self, xs, ys, vals, sensor_size):
        H, W = int(sensor_size[0]), int(sensor_size[1])
        out = np.zeros((H, W), np.float32)
        self.lib.ev_image(_c(xs), _c(ys), _c(vals), len(xs), H, W, out)
        return out

    def polarity_mask(self, ps):
        out = np.zeros((len(ps), 2), np.float32)
        self.lib.ev_polarity_mask(_c(ps), len(ps), out)
        return out

    def normalize_ts(self, ts):
        ts = np.ascontiguousarray(ts, np.float64)
        rng = self.lib.ev_normalize_ts(ts, len(ts))
        return ts, float(rng)


def lif_forward(x, mem, beta, theta):
    """Native reference LIF (deployment semantics), NHWC arrays.

    Used to cross-check exported artifacts on non-JAX hosts."""
    lib = load()
    if lib is None:
        u = beta * mem + x
        spk = (u >= theta).astype(np.float32)
        return spk, np.where(spk > 0, 0.0, u).astype(np.float32)
    x = _c(x)
    C = x.shape[-1]
    n_px = x.size // C
    spike = np.zeros_like(x)
    mem_out = np.zeros_like(x)
    lib.lif_forward(x, _c(mem), _c(beta), _c(theta), n_px, C, spike, mem_out)
    return spike, mem_out
