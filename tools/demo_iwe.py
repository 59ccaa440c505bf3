"""Brute-force contrast-maximization demo: sweep constant flows over a grid
and plot the IWE contrast landscape (reference tools/demo_iwe.py:20-116).

The heatmap maximum should land on the true flow of the event stream —
a visual sanity check of the warping/loss math.
"""

import argparse
import os
import sys

# allow running directly from the repo root or tools/ (the reference scripts
# do the same parent-dir path append)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--h5", default=None, help="sequence file (default: synthetic)")
    parser.add_argument("--num_events", type=int, default=20000)
    parser.add_argument("--steps", type=int, default=21)
    parser.add_argument("--range", type=float, default=0.25, dest="rng")
    parser.add_argument("--flow_scaling", type=float, default=128)
    parser.add_argument("--out", default="iwe_heatmap.png")
    args = parser.parse_args()

    import numpy as np

    from evflow.analysis import contrast_heatmap

    if args.h5:
        import h5py

        with h5py.File(args.h5, "r") as f:
            n = args.num_events
            xs = f["events/xs"][:n].astype(np.float32)
            ys = f["events/ys"][:n].astype(np.float32)
            ts = f["events/ts"][:n].astype(np.float64)
            ps = f["events/ps"][:n].astype(np.float32)
            if ps.size and ps.min() >= 0:  # {0,1} storage convention only
                ps = ps * 2 - 1
        ts = (ts - ts.min()) / max(1e-9, ts.max() - ts.min())
        H = int(ys.max()) + 1
        W = int(xs.max()) + 1
    else:
        from evflow.data.synthetic import generate_sequence

        rng = np.random.default_rng(0)
        xs, ys, ts, ps, flow = generate_sequence(rng, duration=0.2, resolution=(64, 64),
                                                 events_per_sec=args.num_events * 5)
        ts = (ts - ts.min()) / (ts.max() - ts.min())
        ps = ps * 2 - 1
        H = W = 64
        print(f"true flow: {flow} px/s over window")

    events = np.stack([ts.astype(np.float32), ys, xs, ps], axis=-1)
    heat = contrast_heatmap(events, (H, W), flow_range=(-args.rng, args.rng),
                            steps=args.steps, flow_scaling=args.flow_scaling)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    im = ax.imshow(heat, origin="lower",
                   extent=[-args.rng, args.rng, -args.rng, args.rng], cmap="viridis")
    ax.set_xlabel("flow x")
    ax.set_ylabel("flow y")
    ax.set_title("IWE contrast (higher = sharper)")
    plt.colorbar(im)
    fig.savefig(args.out, dpi=130, bbox_inches="tight")
    i, j = np.unravel_index(np.argmax(heat), heat.shape)
    fs = np.linspace(-args.rng, args.rng, args.steps)
    print(f"argmax flow (x, y) = ({fs[j]:.3f}, {fs[i]:.3f}); saved {args.out}")


if __name__ == "__main__":
    main()
