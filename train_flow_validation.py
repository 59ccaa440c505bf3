"""Training with periodic in-process ground-truth validation (AEE/AAE).

CLI equivalent of the reference train_flow_validation.py:132-462 with
``validate_on_mvsec`` :28-130: every ``--val_every`` epochs the live model
is evaluated on the validation dataset *inside the training process* (one
run dir, epoch/loss-variance/patience bookkeeping uninterrupted), and a
``best_val_aae`` checkpoint is kept beside ``best_loss``/``most_recent``.
The reference's save/restore of ``model._states`` around validation
(:44-48) is unnecessary here: evaluation builds its own state carries, so
the training carry pytree is untouched by construction.
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/train_SNN.yml")
    parser.add_argument("--val_config", default="configs/eval_MVSEC.yml")
    parser.add_argument("--path_runs", default="runs")
    parser.add_argument("--prev_runid", default="",
                        help="checkpoint path to resume from")
    parser.add_argument("--val_every", type=int, default=5,
                        help="epochs between validations")
    parser.add_argument("--val_max_windows", type=int, default=None,
                        help="cap validation windows (smoke tests)")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="stop after N train steps (smoke tests)")
    parser.add_argument("--val_chunk", type=int, default=1,
                        help="scan K validation windows per device dispatch")
    parser.add_argument("--val_device_metrics", action="store_true",
                        help="compute validation metrics in-graph (needs "
                             "--val_chunk>1); keeps validation off the host "
                             "critical path between training epochs")
    args = parser.parse_args()

    import jax
    import numpy as np

    from evflow.config import load_config
    from evflow.eval import evaluate
    from evflow.train import train
    from evflow.utils.checkpoint import save_checkpoint

    config = load_config(args.config)
    val_config = load_config(args.val_config)
    val_config["model"] = dict(config["model"])

    best = {"val_aae": float("inf"), "val_aee": float("inf")}

    def validate(epoch, params, batch_stats, run, opt_state=None):
        if args.val_every <= 0 or (epoch + 1) % args.val_every != 0:
            return
        variables = {"params": params, "batch_stats": batch_stats}
        results = evaluate(
            val_config,
            variables=variables,
            debug=True,
            verbose=False,
            max_windows=args.val_max_windows,
            chunk=args.val_chunk,
            device_metrics=args.val_device_metrics,
        )
        vals = {}
        for mname in ("AAE", "AEE"):
            xs = [float(v) for v in results.get(mname, {}).values()]
            if xs:
                vals[mname] = float(np.mean(xs))
                run.log_metric(f"val_{mname}", vals[mname], step=epoch)
        val_aae = vals.get("AAE", vals.get("AEE", float("inf")))
        print(f"epoch {epoch}: validation {vals}")
        if val_aae < best["val_aae"]:
            best["val_aae"] = val_aae
            # the optimizer state ships with the checkpoint so resuming from
            # best_val_aae keeps the Adam moments (reference
            # train_flow_validation.py:296-311 saves optimizer_state_dict)
            state = {
                "params": jax.device_get(params),
                "batch_stats": jax.device_get(batch_stats),
                "opt_state": jax.device_get(opt_state)
                if opt_state is not None else None,
                "epoch": epoch,
                "loss": 0.0,
                "loss_variance": 0.0,
            }
            dst = os.path.join(run.dir, "checkpoints", "best_val_aae", str(epoch))
            save_checkpoint(dst, state, config)
            # keep only the newest best_val_aae (reference keeps one)
            base = os.path.dirname(dst)
            for d in os.listdir(base):
                if d != str(epoch):
                    import shutil

                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)
            print(f"  new best val AAE {val_aae:.4f} -> {dst}")

    run = train(
        config,
        path_runs=args.path_runs,
        prev_ckpt=args.prev_runid or None,
        max_steps=args.max_steps,
        epoch_callback=validate,
    )
    print(f"best val AAE: {best['val_aae']:.4f} (run {run.dir})")


if __name__ == "__main__":
    main()
