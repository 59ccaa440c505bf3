"""Weight / leak / threshold initialization histograms across cell families
(reference tools/compare_inits.py).
"""

import argparse
import os
import sys

# allow running directly from the repo root or tools/ (the reference scripts
# do the same parent-dir path append)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="inits.png")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from evflow.models.cells import ConvLIF, SNNConvLIF

    x = jnp.zeros((1, 16, 16, 2))
    snn = SNNConvLIF(input_size=2, features=64)
    sig = ConvLIF(input_size=2, features=64)
    v_snn = snn.init(jax.random.PRNGKey(0), x, None)
    v_sig = sig.init(jax.random.PRNGKey(0), x, None)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 3, figsize=(12, 6))
    panels = [
        ("snn conv W", np.asarray(v_snn["params"]["ff"]["kernel"]).ravel()),
        ("snn beta", np.asarray(v_snn["params"]["beta"]).ravel()),
        ("snn threshold", np.asarray(v_snn["params"]["threshold"]).ravel()),
        ("sigmoid conv W", np.asarray(v_sig["params"]["ff"]["kernel"]).ravel()),
        ("sigmoid leak (pre-sigmoid)", np.asarray(v_sig["params"]["leak"]).ravel()),
        ("sigmoid thresh", np.asarray(v_sig["params"]["thresh"]).ravel()),
    ]
    for ax, (title, vals) in zip(axes.ravel(), panels):
        ax.hist(vals, bins=40)
        ax.set_title(title, fontsize=9)
    fig.savefig(args.out, dpi=130, bbox_inches="tight")
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
