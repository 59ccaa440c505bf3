"""Profile membrane-voltage dynamics and spike statistics of a model.

CLI equivalent of the reference analyze_voltage_dynamics.py:244-678.
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint", nargs="?", default=None)
    parser.add_argument("--config", default="configs/eval_MVSEC.yml")
    parser.add_argument("--num_batches", type=int, default=100)
    parser.add_argument("--ops", action="store_true",
                        help="also report dense-vs-event-driven synaptic "
                             "operations per window from the measured "
                             "spike rates (the SNN sparsity accounting)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from evflow.analysis import analyze_model
    from evflow.config import load_config
    from evflow.data.h5_stream import H5EventStream
    from evflow.registry import build_model

    config = load_config(args.config)
    model = build_model(config["model"])
    H, W = config["loader"]["resolution"]
    B = int(config["loader"].get("batch_size", 1))
    states = model.init_states(B, H, W)
    variables = model.init(jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states)
    if args.checkpoint:
        if args.checkpoint.endswith((".pth", ".pt")):
            from evflow.utils.checkpoint import import_torch_checkpoint

            variables, _ = import_torch_checkpoint(args.checkpoint, variables)
        else:
            from evflow.utils.checkpoint import load_checkpoint

            restored = load_checkpoint(
                args.checkpoint,
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {}),
                 "opt_state": None, "epoch": 0, "loss": 0.0, "loss_variance": 0.0},
            )
            variables = {"params": restored["params"],
                         "batch_stats": restored["batch_stats"]}

    stream = H5EventStream(config, config["model"].get("num_bins", 2))
    analyze_model(model, variables, stream, num_batches=args.num_batches,
                  ops=args.ops)
    stream.close()


if __name__ == "__main__":
    main()
