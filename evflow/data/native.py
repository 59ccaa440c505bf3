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
_EMPTY_F32 = np.empty(0, np.float32)


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
    if hasattr(lib, "ev_window_assemble"):  # stale prebuilt .so without it
        c_int = ctypes.c_int
        dbl_p = ctypes.POINTER(ctypes.c_double)
        lib.ev_window_assemble.argtypes = [
            _f32p, _f32p, _f64p, _f32p, i64, i64, i64, i64,
            c_int, c_int, c_int, c_int, c_int,
            _f32p, _f32p, _f32p, _f32p, _f32p, dbl_p, dbl_p,
        ]
        lib.ev_window_assemble.restype = c_int
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

    def has_window_assemble(self) -> bool:
        return hasattr(self.lib, "ev_window_assemble")

    def window_assemble(self, xs, ys, ts, ps, sensor_size, num_bins,
                        flip_h=False, flip_v=False, flip_p=False,
                        build_voxel=True, round_ts=False):
        """Fused per-window host path: formatting (±1 polarity, min-max ts
        norm), flip augmentation, and all encodings in one native pass.
        Bit-identical to the separate kernels / numpy path (see
        ev_window_assemble in native/evflow_host.cpp and
        tests/test_native.py).

        Returns (cnt[H,W,2], mask[H,W,1], voxel[H,W,bins]|None,
        event_list[n,4], pol_mask[n,2], dt_input, last_ts); raises
        ValueError on non-finite timestamps (base.py:90-98 guard).
        """
        H, W = int(sensor_size[0]), int(sensor_size[1])
        n = len(xs)
        cnt = np.empty((H, W, 2), np.float32)
        mask = np.empty((H, W, 1), np.float32)
        voxel = np.empty((H, W, num_bins), np.float32) if build_voxel else _EMPTY_F32
        event_list = np.empty((n, 4), np.float32)
        pol_mask = np.empty((n, 2), np.float32)
        dt = ctypes.c_double()
        last_ts = ctypes.c_double()
        rc = self.lib.ev_window_assemble(
            _c(xs), _c(ys), np.ascontiguousarray(ts, np.float64), _c(ps),
            n, H, W, num_bins,
            int(flip_h), int(flip_v), int(flip_p),
            int(build_voxel), int(round_ts),
            cnt, mask, voxel if build_voxel else _EMPTY_F32,
            event_list if n else _EMPTY_F32,
            pol_mask if n else _EMPTY_F32,
            ctypes.byref(dt), ctypes.byref(last_ts),
        )
        if rc != 0:
            raise ValueError("NaN/Inf event timestamps")
        return (cnt, mask, voxel if build_voxel else None, event_list,
                pol_mask, float(dt.value), float(last_ts.value))


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
