"""Host data-pipeline throughput: H5EventStream.next_batch windows/sec.

The device engine consumes ~3600 win/s/chip (bench.py); this measures
whether the host side can feed it and what each pipeline stage is worth:

  * numpy          — pure-python/numpy per-window path
  * native-split   — C++ encoding kernels, separate ctypes calls
  * native-fused   — ONE ev_window_assemble call per window
                     (format+augment+all encodings in a single pass)
  * +event-cache   — whole-file pre-cast event arrays in RAM
                     (loader.event_cache_bytes) instead of per-window
                     h5py reads

Runs CPU-only (no jax). Usage: python benchmarks/bench_loader.py
[--res 256] [--window 8000] [--batch 4] [--iters 100] [--mode events]
"""

import argparse
import sys
import tempfile
import time

sys.path.insert(0, ".")

from evflow.data.h5_stream import H5EventStream  # noqa: E402
from evflow.data.synthetic import make_dataset  # noqa: E402


def build_cfg(root, mode, window, batch, res, **loader_extra):
    loader = {
        "resolution": [res, res],
        "std_resolution": [res, res],
        "batch_size": batch,
        "augment": ["Horizontal", "Vertical", "Polarity"],
        "augment_prob": [0.5, 0.5, 0.5],
        "seed": 0,
    }
    loader.update(loader_extra)
    return {
        "data": {"path": root, "mode": mode, "window": window},
        "loader": loader,
        "hot_filter": {"enabled": False},
        "vis": {"bars": False},
        "model": {"encoding": "cnt"},  # skip the voxel encoder like bench.py
    }


def measure(cfg, iters):
    s = H5EventStream(cfg, num_bins=2)
    for _ in range(10):
        s.next_batch()
    t0 = time.perf_counter()
    for _ in range(iters):
        s.next_batch()
    dt = time.perf_counter() - t0
    s.close()
    return iters * s.batch_size / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--window", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--mode", default="events",
                    choices=["events", "time", "gtflow_dt1"])
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="evflow_loaderbench")
    make_dataset(root, num_sequences=2, resolution=(args.res, args.res),
                 events_per_sec=400_000, duration=5.0, gt_hz=10.0,
                 flows=[(12.0, -8.0), (-10.0, 6.0)])
    window = 1 if args.mode.startswith("gtflow") else args.window

    variants = [
        ("numpy", dict(native_encoder=False, event_cache_bytes=0)),
        ("native-split (no fused)", dict(event_cache_bytes=0,
                                         fused_assembly=False)),
        ("native-fused", dict(event_cache_bytes=0)),
        ("native-fused + event-cache", dict()),
    ]
    for name, extra in variants:
        cfg = build_cfg(root, args.mode, window, args.batch, args.res, **extra)
        rate = measure(cfg, args.iters)
        print(f"{name:28s}: {rate:7.0f} win/s")


if __name__ == "__main__":
    main()
