"""Convert raw MVSEC HDF5 recordings into the reference-schema event files
evflow (and the reference) consume.

The reference's dataloader (dataloader/h5.py:117-175, mirrored by
evflow/data/h5_stream.py) expects per-sequence files with
``events/{xs,ys,ts,ps}`` arrays, an ``attrs['t0']`` epoch, and GT groups
``flow_dt1``/``flow_dt4`` of per-frame ``[2, H, W]`` displacement maps
carrying ``timestamp`` attrs (plus an optional ``images`` group for the
'frames' window mode). The published MVSEC distribution (Zhu et al.,
"The Multivehicle Stereo Event Camera Dataset") ships a different layout:

  <seq>_data.hdf5 : davis/<side>/events  [N, 4] float64  (x, y, t, p)
                    davis/<side>/image_raw      [T, H, W] uint8
                    davis/<side>/image_raw_ts   [T]
  <seq>_gt.hdf5   : davis/<side>/flow_dist     [T, 2, H, W]  (displacement
                    between consecutive GT frames, x then y)
                    davis/<side>/flow_dist_ts  [T]

This tool bridges them:

  python tools/convert_mvsec.py outdoor_day1_data.hdf5 \
      --gt outdoor_day1_gt.hdf5 --out data/mvsec/outdoor_day1.h5

``flow_dt1`` copies the GT displacement frames directly. ``flow_dt4``
composes four consecutive dt1 maps by forward warp accumulation
(d(x) = d0(x) + d1(x + d0(x)) + ..., bilinear-sampled) — the standard
construction for the reference's dt4 evaluation protocol; frames whose
4-frame horizon crosses the sequence end are dropped.

No network access is needed: point it at locally downloaded MVSEC files.
Polarity is normalized to {0, 1} (the loader maps to ±1 at formatting
time, dataloader/base.py:71-99).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def bilinear_sample(field: np.ndarray, xq: np.ndarray, yq: np.ndarray) -> np.ndarray:
    """Sample ``field`` [H, W] at fractional (yq, xq), edge-clamped."""
    H, W = field.shape
    xq = np.clip(xq, 0.0, W - 1.0)
    yq = np.clip(yq, 0.0, H - 1.0)
    x0 = np.floor(xq).astype(np.int64)
    y0 = np.floor(yq).astype(np.int64)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    fx = xq - x0
    fy = yq - y0
    return (
        field[y0, x0] * (1 - fy) * (1 - fx)
        + field[y0, x1] * (1 - fy) * fx
        + field[y1, x0] * fy * (1 - fx)
        + field[y1, x1] * fy * fx
    )


def compose_flow(frames: np.ndarray) -> np.ndarray:
    """Compose consecutive displacement maps [K, 2, H, W] -> one [2, H, W]:
    total(x) = d0(x) + d1(x + d0(x)) + d2(x + d0+d1) + ... (forward warp
    accumulation with bilinear sampling)."""
    _, _, H, W = frames.shape
    gy, gx = np.mgrid[0:H, 0:W].astype(np.float64)
    dx = np.zeros((H, W), np.float64)
    dy = np.zeros((H, W), np.float64)
    for k in range(frames.shape[0]):
        fx, fy = frames[k, 0], frames[k, 1]
        qx, qy = gx + dx, gy + dy  # both components sample at the same point
        dx = dx + bilinear_sample(fx, qx, qy)
        dy = dy + bilinear_sample(fy, qx, qy)
    return np.stack([dx, dy]).astype(np.float32)


def convert(
    data_path: str,
    out_path: str,
    gt_path: str | None = None,
    side: str = "left",
    with_images: bool = True,
    dt4_span: int = 4,
    t_start: float | None = None,
    t_end: float | None = None,
) -> dict:
    """Convert one raw MVSEC recording (+ optional GT file) into one
    reference-schema sequence file. Returns a summary dict."""
    if h5py is None:
        raise ImportError("h5py required")

    with h5py.File(data_path, "r") as f:
        ev = f[f"davis/{side}/events"]
        n = ev.shape[0]
        # stream in chunks: outdoor sequences hold ~1e8 events
        cols = {0: [], 1: [], 2: [], 3: []}
        CH = 8_000_000
        for lo in range(0, n, CH):
            chunk = ev[lo : lo + CH]
            t = chunk[:, 2]
            keep = np.ones(len(chunk), bool)
            if t_start is not None:
                keep &= t >= t_start
            if t_end is not None:
                keep &= t < t_end
            chunk = chunk[keep]
            cols[0].append(chunk[:, 0])
            cols[1].append(chunk[:, 1])
            cols[2].append(chunk[:, 2])
            cols[3].append(chunk[:, 3])
        xs = np.concatenate(cols[0]).astype(np.float32)
        ys = np.concatenate(cols[1]).astype(np.float32)
        ts = np.concatenate(cols[2]).astype(np.float64)
        ps = np.concatenate(cols[3]).astype(np.float32)
        images = images_ts = None
        if with_images and f"davis/{side}/image_raw" in f:
            images = np.asarray(f[f"davis/{side}/image_raw"])
            images_ts = np.asarray(f[f"davis/{side}/image_raw_ts"])

    ps = (ps > 0).astype(np.float32)  # {-1,1} or {0,1} -> {0,1}
    t0 = float(ts[0])

    flow = flow_ts = None
    if gt_path:
        with h5py.File(gt_path, "r") as g:
            flow = np.asarray(g[f"davis/{side}/flow_dist"], np.float32)
            flow_ts = np.asarray(g[f"davis/{side}/flow_dist_ts"], np.float64)
        if t_start is not None or t_end is not None:
            keep = np.ones(len(flow_ts), bool)
            if t_start is not None:
                keep &= flow_ts >= t_start
            if t_end is not None:
                keep &= flow_ts < t_end
            flow, flow_ts = flow[keep], flow_ts[keep]

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with h5py.File(out_path, "w") as out:
        out.attrs["t0"] = t0
        out.attrs["duration"] = float(ts[-1] - ts[0])
        out.attrs["source"] = os.path.basename(data_path)
        g = out.create_group("events")
        g.create_dataset("xs", data=xs, compression="gzip")
        g.create_dataset("ys", data=ys, compression="gzip")
        g.create_dataset("ts", data=ts, compression="gzip")
        g.create_dataset("ps", data=ps, compression="gzip")

        n_gt = n_dt4 = 0
        if flow is not None:
            d1 = out.create_group("flow_dt1")
            for i in range(flow.shape[0]):
                d = d1.create_dataset(f"frame_{i:06d}", data=flow[i])
                d.attrs["timestamp"] = float(flow_ts[i])
                n_gt += 1
            d4 = out.create_group("flow_dt4")
            for i in range(flow.shape[0] - dt4_span + 1):
                comp = compose_flow(flow[i : i + dt4_span])
                d = d4.create_dataset(f"frame_{i:06d}", data=comp)
                d.attrs["timestamp"] = float(flow_ts[i])
                n_dt4 += 1
        n_img = 0
        if images is not None:
            ig = out.create_group("images")
            for i in range(images.shape[0]):
                d = ig.create_dataset(f"image_{i:06d}", data=images[i])
                d.attrs["timestamp"] = float(images_ts[i])
                n_img += 1

    return {
        "events": int(len(xs)),
        "t0": t0,
        "duration": float(ts[-1] - ts[0]),
        "gt_frames": n_gt,
        "dt4_frames": n_dt4,
        "images": n_img,
        "out": out_path,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("data", help="raw MVSEC <seq>_data.hdf5")
    ap.add_argument("--gt", default=None, help="raw MVSEC <seq>_gt.hdf5")
    ap.add_argument("--out", required=True, help="output reference-schema .h5")
    ap.add_argument("--side", default="left", choices=["left", "right"])
    ap.add_argument("--no_images", action="store_true")
    ap.add_argument("--t_start", type=float, default=None,
                    help="keep events/GT with t >= t_start (raw seconds)")
    ap.add_argument("--t_end", type=float, default=None)
    args = ap.parse_args(argv)
    info = convert(args.data, args.out, gt_path=args.gt, side=args.side,
                   with_images=not args.no_images,
                   t_start=args.t_start, t_end=args.t_end)
    print(", ".join(f"{k}={v}" for k, v in info.items()))


if __name__ == "__main__":
    main()
