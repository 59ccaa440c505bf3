"""Evaluate a trained model against ground-truth optical flow (AEE/AAE/...).

CLI equivalent of the reference eval_flow.py:399-421:
  python eval_flow.py <checkpoint> --config configs/eval_MVSEC.yml
The checkpoint may be an evflow checkpoint dir/msgpack, a run id under
--path_runs, or a reference PyTorch .pth (imported automatically).
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint", help="checkpoint path / run id / reference .pth")
    parser.add_argument("--config", default="configs/eval_MVSEC.yml",
                        help="config file, overwrites training settings")
    parser.add_argument("--path_runs", default="runs")
    parser.add_argument("--path_results", default="results_inference/")
    parser.add_argument("--debug", action="store_true", help="don't save stuff")
    parser.add_argument("--max_windows", type=int, default=None)
    parser.add_argument("--fused", action="store_true",
                        help="use the Pallas fused conv+LIF inference path")
    parser.add_argument("--num_devices", type=int, default=1,
                        help="fan batch slots out over a 1-D data mesh of N "
                             "devices (each chip evaluates different "
                             "sequences; batch_size must be divisible by N)")
    parser.add_argument("--chunk", type=int, default=1,
                        help="scan K windows per device dispatch (identical "
                             "metrics; amortizes per-dispatch latency on "
                             "remote/tunneled hosts)")
    parser.add_argument("--device_metrics", action="store_true",
                        help="compute the metric protocol in-graph (needs "
                             "--chunk>1): GT rides up with the events, only "
                             "[K,B] metric scalars ride down, and the host "
                             "does no per-window metric math")
    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="write a jax.profiler device trace to DIR "
                             "(TensorBoard/Perfetto format) for the run — the "
                             "TPU analog of the reference's timing hooks")
    args = parser.parse_args()

    from evflow.config import load_config, merge_configs
    from evflow.eval import evaluate

    config = load_config(args.config)

    ckpt = args.checkpoint
    runid = os.path.basename(ckpt.rstrip("/")) or "eval"
    # run-id resolution: merge training params back like the reference merges
    # MLflow run params (eval_flow.py:52-53). An existing path is a direct
    # checkpoint reference — never reinterpreted as a run id.
    for exp in ([] if os.path.exists(ckpt) else
                (os.listdir(args.path_runs) if os.path.isdir(args.path_runs) else [])):
        cand = os.path.join(args.path_runs, exp, ckpt)
        if os.path.isdir(cand):
            import yaml

            with open(os.path.join(cand, "params.yaml")) as f:
                train_params = yaml.safe_load(f)
            # merge_configs overlays eval settings on the training params —
            # eval wins on conflicts, training-only keys (model arch) survive
            config = merge_configs(
                {k: str(v) for k, v in train_params.items()}, config
            )
            ckpt = os.path.join(cand, "checkpoints", "lowest_loss")
            if os.path.isdir(ckpt):
                ckpt = os.path.join(ckpt, sorted(os.listdir(ckpt))[-1])
            runid = args.checkpoint
            break

    mesh = None
    if args.num_devices and args.num_devices > 1:
        from evflow.parallel.mesh import make_mesh

        mesh = make_mesh(args.num_devices)

    import contextlib

    if args.profile:
        import jax

        prof = jax.profiler.trace(args.profile)
    else:
        prof = contextlib.nullcontext()
    with prof:
        results = evaluate(
            config,
            checkpoint=ckpt,
            path_results=args.path_results,
            runid=runid,
            debug=args.debug,
            max_windows=args.max_windows,
            fused=args.fused,
            chunk=args.chunk,
            mesh=mesh,
            device_metrics=args.device_metrics,
        )
    print()
    for metric, per_file in results.items():
        for fname, val in per_file.items():
            print(f"{metric:16s} {fname:32s} {val}")


if __name__ == "__main__":
    main()
