"""Autotune the serving configuration of a deployment on the local chip.

Measures the (membrane tier x streams-per-chip) grid of the int8
deployment engine on whatever accelerator JAX sees, prints the table and
the winner as JSON, and optionally writes a deploy artifact carrying the
tuned config (loaded back by ``Int8DeployEngine.from_artifact`` —
``engine.serving``). The optimal point is regime-dependent (BENCH_NOTES.md
rounds 4-7: it flipped twice on this repo's chip), so deployments should
measure on the target hardware rather than copy another rig's numbers —
the same philosophy as the reference's per-layer membrane-range auto-tune
(eval_flow_quant.py:186-463).

    python tools/autotune_serving.py --config configs/eval_MVSEC.yml \
        [checkpoint] [--resolution 256] [--batches 1 2 4] \
        [--tiers bfloat16 mixed int8] [--chunk 256] [--save artifact.npz]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--config", default="configs/eval_MVSEC.yml")
    p.add_argument("--resolution", type=int, default=None,
                   help="override square serving resolution (default: "
                        "loader.resolution from the config)")
    p.add_argument("--tiers", nargs="+", default=["bfloat16", "mixed", "int8"],
                   choices=["bfloat16", "mixed", "int8"])
    p.add_argument("--batches", nargs="+", type=int, default=[1, 2, 4])
    p.add_argument("--chunk", nargs="+", type=int, default=[256],
                   help="scan length(s) per dispatch (also the recommended "
                        "serving chunk); pass several to sweep the "
                        "latency/throughput trade-off in one run")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--save", default=None,
                   help="write a deploy artifact (.npz) carrying the tuned "
                        "serving config (built at the winning tier)")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from evflow.autotune import autotune_serving
    from evflow.config import load_config
    from evflow.deploy import Int8DeployEngine, save_engine
    from evflow.registry import build_model

    config = load_config(args.config)
    model = build_model(config["model"])
    if args.resolution:
        H = W = args.resolution
    else:
        H, W = config["loader"]["resolution"]
    states0 = model.init_states(1, H, W)
    variables = model.init(
        jax.random.PRNGKey(0), None, jnp.zeros((1, H, W, 2)), states0
    )
    if args.checkpoint:
        from evflow.utils.checkpoint import import_torch_checkpoint, load_checkpoint

        if args.checkpoint.endswith((".pth", ".pt")):
            variables, _ = import_torch_checkpoint(args.checkpoint, variables)
        else:
            restored = load_checkpoint(
                args.checkpoint,
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {}),
                 "opt_state": None, "epoch": 0, "loss": 0.0,
                 "loss_variance": 0.0},
            )
            variables = {"params": restored["params"],
                         "batch_stats": restored["batch_stats"]}

    cfgk = autotune_serving(
        model, variables, H, W, tiers=tuple(args.tiers),
        batches=tuple(args.batches), chunks=tuple(args.chunk),
        iters=args.iters, verbose=True,
    )
    print(json.dumps({"best": cfgk.to_meta()}))
    if args.save:
        engine = Int8DeployEngine(model, variables, mem_dtype=cfgk.mem_dtype)
        engine.serving = cfgk.to_meta()
        path = save_engine(engine, args.save)
        print(f"artifact with tuned serving config: {path}")


if __name__ == "__main__":
    main()
