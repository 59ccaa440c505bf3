"""Histogram all parameters of a checkpoint (reference tools/plot_model_param.py)."""

import argparse
import os
import sys

# allow running directly from the repo root or tools/ (the reference scripts
# do the same parent-dir path append)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint")
    parser.add_argument("--config", default="configs/eval_MVSEC.yml")
    parser.add_argument("--out", default="params.png")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from evflow.config import load_config
    from evflow.registry import build_model
    from evflow.utils.checkpoint import load_checkpoint

    config = load_config(args.config)
    model = build_model(config["model"])
    H, W = config["loader"]["resolution"]
    states = model.init_states(1, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((1, H, W, 2)), states)
    restored = load_checkpoint(
        args.checkpoint,
        {"params": v["params"], "batch_stats": v.get("batch_stats", {}),
         "opt_state": None, "epoch": 0, "loss": 0.0, "loss_variance": 0.0},
    )

    flat = jax.tree_util.tree_flatten_with_path(restored["params"])[0]
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(flat)
    cols = 4
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(3.2 * cols, 2.2 * rows))
    for ax, (path, val) in zip(np.ravel(axes), flat):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        ax.hist(np.asarray(val).ravel(), bins=40)
        ax.set_title(name, fontsize=6)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
