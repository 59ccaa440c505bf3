"""Autotune the serving configuration of a deployment on the local chip.

Measures the (membrane tier x streams-per-chip x chunk) grid of the int8
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

``--save`` builds the artifact the same way the validated deploy path
does (eval_flow_quant.py --mode deploy): the config's pooling-derived
``input_scale`` and, for int8/mixed membrane tiers, per-channel membrane
ranges profiled from the config's data stream.
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
                        "loader.resolution from the config); implies "
                        "input_scale=1 (no pooling at the measured size)")
    p.add_argument("--tiers", nargs="+", default=["bfloat16", "mixed", "int8"],
                   choices=["bfloat16", "mixed", "int8", "hybrid", "hybrid8",
                            "hybrid+phase", "hybrid8+phase"],
                   help="FireNet: membrane tiers (bfloat16/mixed/int8). "
                        "UNet configs: conv compute tiers "
                        "(bfloat16/int8/hybrid/hybrid8); the default grid "
                        "becomes the UNet tier set automatically")
    p.add_argument("--batches", nargs="+", type=int, default=[1, 2, 4])
    p.add_argument("--chunk", nargs="+", type=int, default=[256],
                   help="scan length(s) per dispatch (also the recommended "
                        "serving chunk); pass several to sweep the "
                        "latency/throughput trade-off in one run")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--profile_batches", type=int, default=100,
                   help="windows streamed to profile int8/mixed membrane "
                        "ranges when saving those tiers")
    p.add_argument("--save", default=None,
                   help="write a deploy artifact (.npz) carrying the tuned "
                        "serving config (built at the winning tier); "
                        "requires a trained checkpoint")
    args = p.parse_args()
    if args.save and not args.checkpoint:
        p.error("--save requires a trained checkpoint — a randomly-"
                "initialized artifact would serve garbage flow silently")
    if args.save and args.resolution:
        p.error("--save with --resolution is rejected: the artifact must "
                "carry the CONFIG's geometry and pooling input_scale (a "
                "--resolution-forced input_scale=1.0 would quantize pooled "
                "fractional counts on the wrong grid); measure with "
                "--resolution separately, save without it")

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
    if config["model"].get("encoding", "cnt") != "cnt":
        p.error("voxel-encoding models need a window-calibrated input_scale "
                "— autotune/deploy them via eval_flow_quant.py --mode deploy")
    model = build_model(config["model"])
    is_unet = model.__class__.__name__ == "SpikingRecEVFlowNet"
    if is_unet:
        # the UNet engine's tier axis is the conv COMPUTE tier
        # (evflow/deploy_unet.py; membranes are bf16 — "mixed" is
        # FireNet-only)
        if args.tiers == ["bfloat16", "mixed", "int8"]:  # the default grid
            args.tiers = ["bfloat16", "int8", "hybrid", "hybrid8",
                          "hybrid+phase", "hybrid8+phase"]
        elif "mixed" in args.tiers:
            p.error("the UNet engine has no mixed membrane tier; its tiers "
                    "are compute tiers bfloat16/int8/hybrid/hybrid8")
    elif any(t.startswith(("hybrid", "hybrid8")) for t in args.tiers):
        p.error("hybrid tiers are UNet-engine compute tiers; FireNet "
                "membrane tiers are bfloat16/mixed/int8")
    if args.resolution:
        # an explicit square override measures at that size with no pooling
        H = W = args.resolution
        input_scale = 1.0
    else:
        H, W = config["loader"]["resolution"]
        # downsample pooling makes counts fractional in multiples of
        # 1/(ph*pw); that exact input_scale keeps the int8 input grid
        # lossless (same rule as serve_stream / eval_flow_quant deploy)
        sh, sw = config["loader"].get("std_resolution", [H, W])
        input_scale = 1.0 if (sh, sw) == (H, W) else 1.0 / ((sh // H) * (sw // W))
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
        iters=args.iters, input_scale=input_scale, verbose=True,
    )
    print(json.dumps({"best": cfgk.to_meta()}))
    if args.save:
        mem_ranges = None
        if not is_unet and cfgk.mem_dtype in ("int8", "mixed"):
            # build the artifact exactly like the validated deploy path:
            # profile per-channel membrane ranges over the config's data
            # (eval_flow_quant.py --mode deploy), not the [-250, 1] default
            from evflow.data.h5_stream import H5EventStream
            from evflow.deploy import profile_mem_ranges

            stream = H5EventStream(config, config["model"].get("num_bins", 2),
                                   config["model"].get("round_encoding", False))
            windows = [stream.next_batch()["event_cnt"]
                       for _ in range(args.profile_batches)]
            stream.close()
            mem_ranges = profile_mem_ranges(model, variables, windows,
                                            input_scale=input_scale)
            print(f"profiled membrane ranges over {len(windows)} windows")
        if is_unet:
            from evflow.deploy_unet import Int8UNetEngine, save_unet_engine

            phase = cfgk.mem_dtype.endswith("+phase")
            engine = Int8UNetEngine(
                model, variables,
                compute=(cfgk.mem_dtype[:-6] if phase else cfgk.mem_dtype),
                phase_decoders=phase, input_scale=input_scale)
            engine.serving = cfgk.to_meta()
            path = save_unet_engine(engine, args.save)
        else:
            engine = Int8DeployEngine(model, variables,
                                      mem_dtype=cfgk.mem_dtype,
                                      mem_ranges=mem_ranges,
                                      input_scale=input_scale)
            engine.serving = cfgk.to_meta()
            path = save_engine(engine, args.save)
        print(f"artifact with tuned serving config: {path}")


if __name__ == "__main__":
    main()
