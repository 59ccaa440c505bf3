"""Synthetic event sequences in the reference HDF5 schema.

Generates translating random-dot scenes with exactly known optical flow and
writes files laid out like the reference's MVSEC-style .h5 (events/{xs,ys,
ts,ps}, attrs t0/duration, flow_dt1/flow_dt4 GT groups with per-dataset
``timestamp`` attrs, optional images group) so the full data/eval stack can
be exercised end-to-end without the real datasets (no MVSEC in CI — see
SURVEY.md §4).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

__all__ = ["generate_sequence", "write_h5_sequence", "make_dataset"]


def generate_sequence(
    rng: np.random.Generator,
    duration: float = 1.0,
    resolution: Tuple[int, int] = (64, 64),
    events_per_sec: int = 50_000,
    flow_px_per_sec: Tuple[float, float] = (12.0, -8.0),
    rate_mode: str = "fixed",
    rate_ref: float = 16.0,
):
    """Events from a translating random-dot texture.

    Returns (xs, ys, ts, ps[0/1], flow) with ``flow = (vx, vy)`` px/s, events
    sorted by timestamp; dots wrap around the sensor.

    ``rate_mode="fixed"`` emits ``events_per_sec`` regardless of motion (the
    original behavior — useful for controlled loader/throughput tests but
    physically wrong across speeds). ``rate_mode="motion"`` scales the rate
    by ``|flow| / rate_ref``: a real event camera fires on brightness
    changes, so a translating scene's event rate is proportional to its
    speed — this is the property that makes event *density* encode speed
    and lets event-count windows carry a uniform displacement per window
    across sequences of different speeds (the reference's UZH-FPV training
    data has it naturally; fixed-rate synthetic data does not, see
    benchmarks/VALIDATION.md round 7).
    """
    H, W = resolution
    vx, vy = flow_px_per_sec
    if rate_mode == "motion":
        speed = float(np.hypot(vx, vy))
        n = int(duration * events_per_sec * max(speed, 1e-3) / rate_ref)
    elif rate_mode == "fixed":
        n = int(duration * events_per_sec)
    else:
        raise ValueError(f"rate_mode must be 'fixed' or 'motion', got {rate_mode!r}")
    ts = np.sort(rng.uniform(0.0, duration, n))
    n_dots = max(16, (H * W) // 64)
    dot_x = rng.uniform(0, W, n_dots)
    dot_y = rng.uniform(0, H, n_dots)
    dot_p = rng.integers(0, 2, n_dots)
    which = rng.integers(0, n_dots, n)
    xs = (dot_x[which] + vx * ts) % W
    ys = (dot_y[which] + vy * ts) % H
    # small sensor jitter
    xs = np.clip(xs + rng.normal(0, 0.2, n), 0, W - 1)
    ys = np.clip(ys + rng.normal(0, 0.2, n), 0, H - 1)
    ps = dot_p[which].astype(np.float32)
    return (
        xs.astype(np.float32),
        ys.astype(np.float32),
        ts.astype(np.float64),
        ps,
        (vx, vy),
    )


def write_h5_sequence(
    path: str,
    rng: np.random.Generator,
    duration: float = 1.0,
    resolution: Tuple[int, int] = (64, 64),
    events_per_sec: int = 50_000,
    flow_px_per_sec: Tuple[float, float] = (12.0, -8.0),
    gt_hz: float = 10.0,
    t0: float = 100.0,
    with_frames: bool = False,
    rate_mode: str = "fixed",
    rate_ref: float = 16.0,
):
    """Write one reference-schema sequence file; returns the GT flow (vx, vy)."""
    if h5py is None:
        raise ImportError("h5py required")
    H, W = resolution
    xs, ys, ts, ps, (vx, vy) = generate_sequence(
        rng, duration, resolution, events_per_sec, flow_px_per_sec,
        rate_mode=rate_mode, rate_ref=rate_ref,
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        f.attrs["t0"] = t0
        f.attrs["duration"] = duration
        g = f.create_group("events")
        g.create_dataset("xs", data=xs)
        g.create_dataset("ys", data=ys)
        g.create_dataset("ts", data=ts + t0)
        g.create_dataset("ps", data=ps)

        n_gt = int(duration * gt_hz) + 1
        gt_ts = np.linspace(0.0, duration, n_gt)
        dt = 1.0 / gt_hz
        for name, scale in (("flow_dt1", dt), ("flow_dt4", 4 * dt)):
            grp = f.create_group(name)
            for i, t in enumerate(gt_ts):
                # GT displacement over the GT frame interval, [2, H, W] (x, y)
                fm = np.zeros((2, H, W), np.float32)
                fm[0] = vx * scale
                fm[1] = vy * scale
                d = grp.create_dataset(f"frame_{i:06d}", data=fm)
                d.attrs["timestamp"] = t + t0
        if with_frames:
            img_grp = f.create_group("images")
            for i, t in enumerate(gt_ts):
                img = (rng.uniform(0, 255, (H, W))).astype(np.uint8)
                d = img_grp.create_dataset(f"image_{i:06d}", data=img)
                d.attrs["timestamp"] = t + t0
    return vx, vy


def make_dataset(
    root: str,
    num_sequences: int = 2,
    seed: int = 0,
    duration: float = 1.0,
    resolution: Tuple[int, int] = (64, 64),
    events_per_sec: int = 50_000,
    flows: Optional[Sequence[Tuple[float, float]]] = None,
    gt_hz: float = 10.0,
    with_frames: bool = False,
    rate_mode: str = "fixed",
    rate_ref: float = 16.0,
):
    """Write a directory of synthetic sequences; returns list of GT flows."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(num_sequences):
        flow = (
            flows[i]
            if flows is not None
            else (float(rng.uniform(-16, 16)), float(rng.uniform(-16, 16)))
        )
        out.append(
            write_h5_sequence(
                os.path.join(root, f"seq_{i:03d}.h5"),
                rng,
                duration=duration,
                resolution=resolution,
                events_per_sec=events_per_sec,
                flow_px_per_sec=flow,
                gt_hz=gt_hz,
                with_frames=with_frames,
                rate_mode=rate_mode,
                rate_ref=rate_ref,
            )
        )
    return out
