"""Published reference accuracy across processing resolutions.

Reproduces the comparison chart of the reference
plot_evaluation_comparison.py:5-14 (its hardcoded numbers are the only
quantitative baseline the reference repo publishes — see BASELINE.md) and
optionally overlays results from evflow metrics_N.yml files.
"""

import argparse

# Reference-published numbers (plot_evaluation_comparison.py:9-14):
RESOLUTIONS = [256, 128, 64, 32]
REFERENCE = {
    "old": {  # avg-pool GT + input
        "AAE": [23.6, 29.6, 49.1, 64.9],
        "AEE": [2.7, 2.4, 2.7, 2.8],
    },
    "new": {  # pool input, upsample output
        "AAE": [23.6, 27.8, 45.1, 60.4],
        "AEE": [2.7, 2.8, 3.2, 3.5],
    },
}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ours", nargs="*", default=[],
                        help="metrics_N.yml files to overlay (one per resolution, "
                             "ordered 256,128,64,32)")
    parser.add_argument("--out", default="evaluation_comparison.png")
    args = parser.parse_args()

    import numpy as np
    import yaml

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    for ax, metric in zip(axes, ("AAE", "AEE")):
        for approach, style in (("old", "o--"), ("new", "s-")):
            ax.plot(RESOLUTIONS, REFERENCE[approach][metric], style,
                    label=f"reference ({approach})")
        if args.ours:
            vals = []
            for path in args.ours:
                with open(path) as f:
                    m = yaml.safe_load(f)
                per_file = m.get(metric, {})
                nums = [float(v) for v in per_file.values()]
                vals.append(np.mean(nums) if nums else np.nan)
            ax.plot(RESOLUTIONS[: len(vals)], vals, "d-", label="evflow (ours)")
        ax.set_xlabel("processing resolution")
        ax.set_ylabel(f"{metric} ({'deg' if metric == 'AAE' else 'px'})")
        ax.set_xscale("log", base=2)
        ax.invert_xaxis()
        ax.legend()
        ax.grid(alpha=0.3)
    fig.savefig(args.out, dpi=130, bbox_inches="tight")
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
