"""Train a FireNet-family SNN with the self-supervised event-warping loss.

CLI equivalent of the reference train_flow.py:305-326:
  python train_flow.py --config configs/train_SNN.yml [--prev_runid RUNID]
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/train_SNN.yml",
                        help="training configuration")
    parser.add_argument("--path_runs", default="runs",
                        help="tracking/checkpoint root (replaces --path_mlflow)")
    parser.add_argument("--prev_runid", default="",
                        help="checkpoint dir/file of a pre-trained model to resume from")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="data-parallel device count (default: all)")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="write a jax.profiler device trace to DIR "
                             "(TensorBoard/Perfetto format)")
    args = parser.parse_args()

    from evflow.config import load_config
    from evflow.train import train

    config = load_config(args.config)
    mesh = None
    if args.num_devices is None or args.num_devices > 1:
        import jax

        from evflow.parallel.mesh import make_mesh

        n = args.num_devices or len(jax.devices())
        if n > 1 and config["loader"]["batch_size"] % n == 0:
            mesh = make_mesh(n)

    import contextlib

    if args.profile:
        import jax

        prof = jax.profiler.trace(args.profile)
    else:
        prof = contextlib.nullcontext()
    with prof:
        run = train(
            config,
            path_runs=args.path_runs,
            prev_ckpt=args.prev_runid or None,
            mesh=mesh,
            max_steps=args.max_steps,
            verbose=bool(config.get("vis", {}).get("verbose", True)),
        )
    print(f"\nRun dir: {run.dir}")


if __name__ == "__main__":
    main()
