#!/usr/bin/env python
"""Generate a synthetic event-camera dataset in the reference HDF5 schema.

Thin CLI over ``evflow.data.synthetic.make_dataset`` so the full pipeline
(train -> eval -> quantize -> export -> serve) is runnable end-to-end
without MVSEC downloads. The reference repo assumes pre-converted MVSEC/
UZH-FPV .h5 files and ships no generator (SURVEY.md §4: no fixtures); this
is the evflow-native substitute used by the test suite and the
getting-started walkthrough.

Example (the docs/GETTING_STARTED.md layout):

    python tools/make_synthetic.py datasets/synthetic/train -n 4 --rate_mode motion
    python tools/make_synthetic.py datasets/synthetic/eval  -n 2 --seed 7
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from evflow.data.synthetic import make_dataset  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("out", help="output directory for seq_NNN.h5 files")
    p.add_argument("-n", "--num_sequences", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--duration", type=float, default=1.0, help="seconds per sequence")
    p.add_argument("--resolution", type=int, nargs=2, default=[64, 64], metavar=("H", "W"))
    p.add_argument("--events_per_sec", type=int, default=50_000)
    p.add_argument("--gt_hz", type=float, default=10.0, help="GT flow frame rate (flow_dt1 cadence)")
    p.add_argument(
        "--flows", type=float, nargs="+", default=None,
        metavar="V", help="explicit per-sequence flows as vx vy pairs (px/s); random if omitted",
    )
    p.add_argument("--with_frames", action="store_true", help="also write an images/ group")
    p.add_argument(
        "--rate_mode", choices=("fixed", "motion"), default="fixed",
        help="'motion' scales event rate with |flow| (real-camera property; "
             "required for multi-speed training data — benchmarks/VALIDATION.md)",
    )
    p.add_argument("--rate_ref", type=float, default=16.0, help="px/s speed that maps to events_per_sec under rate_mode=motion")
    args = p.parse_args()

    flows = None
    if args.flows is not None:
        if len(args.flows) % 2 != 0:
            p.error("--flows takes vx vy pairs (even count)")
        flows = [(args.flows[i], args.flows[i + 1]) for i in range(0, len(args.flows), 2)]
        if len(flows) != args.num_sequences:
            p.error(f"--flows gave {len(flows)} pairs but -n is {args.num_sequences}")

    out = make_dataset(
        args.out,
        num_sequences=args.num_sequences,
        seed=args.seed,
        duration=args.duration,
        resolution=tuple(args.resolution),
        events_per_sec=args.events_per_sec,
        flows=flows,
        gt_hz=args.gt_hz,
        with_frames=args.with_frames,
        rate_mode=args.rate_mode,
        rate_ref=args.rate_ref,
    )
    for i, (vx, vy) in enumerate(out):
        print(f"seq_{i:03d}.h5  flow=({vx:+.2f}, {vy:+.2f}) px/s")
    print(f"wrote {len(out)} sequences to {args.out}")


if __name__ == "__main__":
    main()
