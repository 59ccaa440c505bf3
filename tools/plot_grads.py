"""Plot per-weight gradient statistics from a training run's grads_w.csv
(reference tools/plot_grads.py; the CSV is written by train.py when
vis.store_grads is enabled).
"""

import argparse
import os
import sys

# allow running directly from the repo root or tools/ (the reference scripts
# do the same parent-dir path append)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("csv", help="grads_w.csv from a run dir")
    parser.add_argument("--out", default="grads.png")
    args = parser.parse_args()

    import pandas as pd

    df = pd.read_csv(args.csv)
    mean_cols = [c for c in df.columns if c.endswith("/mean")]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(11, 6))
    for c in mean_cols:
        ax.plot(df[c], label=c.replace("/mean", ""), lw=0.8)
    ax.set_yscale("log")
    ax.set_xlabel("update step")
    ax.set_ylabel("|grad| mean")
    ax.legend(fontsize=6, ncol=2)
    fig.savefig(args.out, dpi=130, bbox_inches="tight")
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
