"""LIF layer activity vs. input event-window size
(reference tools/compare_dynrange.py).
"""

import argparse
import os
import sys

# allow running directly from the repo root or tools/ (the reference scripts
# do the same parent-dir path append)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/train_SNN.yml")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--windows", type=int, nargs="+",
                        default=[250, 500, 1000, 2000, 4000])
    parser.add_argument("--num_batches", type=int, default=20)
    parser.add_argument("--out", default="dynrange.png")
    args = parser.parse_args()

    import copy

    import jax
    import jax.numpy as jnp

    from evflow.analysis import activity_vs_window
    from evflow.config import load_config
    from evflow.data.h5_stream import H5EventStream
    from evflow.registry import build_model

    config = load_config(args.config)
    model = build_model(config["model"])
    H, W = config["loader"]["resolution"]
    B = int(config["loader"].get("batch_size", 1))
    states = model.init_states(B, H, W)
    variables = model.init(jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states)

    def stream_factory(window):
        cfg = copy.deepcopy(config)
        cfg["data"]["window"] = window
        return H5EventStream(cfg, config["model"].get("num_bins", 2))

    result = activity_vs_window(model, variables, stream_factory, args.windows,
                                args.num_batches)
    for w, a in result.items():
        print(f"window {w:6d}: mean activity {a:.4f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.plot(list(result.keys()), list(result.values()), "o-")
    ax.set_xlabel("events per window")
    ax.set_ylabel("mean layer activity")
    ax.set_xscale("log")
    fig.savefig(args.out, dpi=130, bbox_inches="tight")


if __name__ == "__main__":
    main()
