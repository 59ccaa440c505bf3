"""Export a trained model to a deployable StableHLO artifact + golden data.

CLI equivalent of the reference Model_export.py / Model_export_RealQuant.py /
LIF_layer_export.py / ConvLIF_layer_export.py (the ONNX + custom-C++-operator
pipeline collapses into jax.export on TPU).
"""

import argparse
import os


def verify_artifacts(art_dir: str, atol: float = 5e-2) -> bool:
    """Replay every StableHLO artifact in ``art_dir`` against its golden
    inputs and compare to the recorded golden outputs — the deployment-host
    acceptance check (the analog of the reference shipping inputs.npz /
    outputs.npz next to its ONNX for Deeploy validation,
    Model_export.py:133-160). Returns True when all artifacts match."""
    import glob

    import numpy as np

    from evflow import export as E

    pairs = []
    if os.path.exists(os.path.join(art_dir, "model.stablehlo")):
        pairs.append(("model.stablehlo", "inputs.npz", "outputs.npz"))
    if os.path.exists(os.path.join(art_dir, "model_int8.stablehlo")):
        pairs.append(("model_int8.stablehlo", "int8_inputs.npz", "int8_outputs.npz"))
    if not pairs:
        print(f"no model artifacts found under {art_dir}")
        return False

    def unvoid(a):
        # np.savez stores ml_dtypes bfloat16 as raw void-2 bytes; the bit
        # pattern reinterprets exactly
        if a.dtype.kind == "V" and a.dtype.itemsize == 2:
            import ml_dtypes

            return a.view(ml_dtypes.bfloat16)
        return a

    all_ok = True
    for art, fin, fout in pairs:
        gin = {k: unvoid(v) for k, v in np.load(os.path.join(art_dir, fin)).items()}
        gout = {k: unvoid(v) for k, v in np.load(os.path.join(art_dir, fout)).items()}
        import jax.numpy as jnp

        from evflow.ops.lif import LIFState

        mems = sorted((k for k in gin if k.startswith("mem_")),
                      key=lambda k: int(k.split("_")[1]))
        spks = {int(k.split("_")[1]): gin[k] for k in gin if k.startswith("spk_")}
        states = tuple(
            LIFState(jnp.asarray(gin[m]),
                     jnp.asarray(spks[i]) if i in spks else None)
            for i, m in enumerate(mems)
        )
        try:
            flow, _ = E.load_and_run_stablehlo(
                os.path.join(art_dir, art), jnp.asarray(gin["input"]), states
            )
        except Exception as e:
            all_ok = False
            print(f"{art}: FAIL ({type(e).__name__}: {str(e)[:160]})")
            continue
        d = float(np.max(np.abs(np.asarray(flow) - np.asarray(gout["flow"],
                                                              np.float32))))
        ok = d <= atol
        all_ok &= ok
        print(f"{art}: max|flow - golden| = {d:.2e} "
              f"{'OK' if ok else f'FAIL (tol {atol})'}")
    return all_ok


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint", nargs="?", default=None,
                        help="checkpoint path / reference .pth (omit for random init)")
    parser.add_argument("--config", default="configs/eval_MVSEC.yml")
    parser.add_argument("--out", default="exported_models")
    parser.add_argument("--height", type=int, default=256)
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--what", default="model",
                        choices=["model", "deploy", "lif_layer", "conv_lif_layer"])
    parser.add_argument("--verify", metavar="DIR", default=None,
                        help="replay an exported artifact dir against its "
                             "golden inputs/outputs and exit (deployment-"
                             "host acceptance check)")
    parser.add_argument("--mem_dtype", default="bfloat16",
                        choices=["bfloat16", "int8", "mixed"],
                        help="deploy export: membrane carry dtype (mixed = "
                             "bf16 head membrane, int8 elsewhere)")
    parser.add_argument("--quantized", action="store_true",
                        help="int8-grid weights + quant metadata "
                             "(Model_export_RealQuant.py equivalent)")
    parser.add_argument("--compute", default="hybrid",
                        choices=["bfloat16", "int8", "hybrid", "hybrid8"],
                        help="UNet deploy export: conv compute tier "
                             "(same integer arithmetic; pick the "
                             "autotuner's winner for the target chip)")
    parser.add_argument("--phase_decoders", action="store_true",
                        help="UNet deploy export: phase-decomposed decoders "
                             "(bilinear x2 folded into 4 low-res kernels; "
                             "1-2 px border divergence, see DEPLOYMENT.md)")
    args = parser.parse_args()

    from evflow import export as E

    if args.verify:
        import sys

        ok = verify_artifacts(args.verify)
        sys.exit(0 if ok else 1)

    if args.what == "lif_layer":
        print(E.export_lif_layer(args.out))
        return
    if args.what == "conv_lif_layer":
        print(E.export_conv_lif_layer(args.out))
        return

    import jax
    import jax.numpy as jnp

    from evflow.config import load_config
    from evflow.registry import build_model

    config = load_config(args.config)
    model = build_model(config["model"])
    H, W = args.height, args.width
    states = model.init_states(1, H, W)
    variables = model.init(jax.random.PRNGKey(0), None, jnp.zeros((1, H, W, 2)), states)
    if args.checkpoint:
        if args.checkpoint.endswith((".pth", ".pt")):
            from evflow.utils.checkpoint import import_torch_checkpoint

            variables, leftover = import_torch_checkpoint(args.checkpoint, variables)
            if leftover:
                print(f"note: {len(leftover)} unmatched torch keys")
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

    if args.what == "deploy":
        if model.__class__.__name__ == "SpikingRecEVFlowNet":
            from evflow.deploy_unet import Int8UNetEngine, save_unet_engine

            if args.mem_dtype not in ("bfloat16",):
                raise SystemExit("the UNet engine carries bf16 membranes")
            engine = Int8UNetEngine(model, variables, compute=args.compute,
                                    phase_decoders=args.phase_decoders)
            out = E.export_deploy_engine(engine, args.out, height=H, width=W)
            out["engine_params"] = save_unet_engine(
                engine, os.path.join(args.out, "engine_int8.npz")
            )
        else:
            if args.compute != "hybrid" or args.phase_decoders:
                raise SystemExit("--compute/--phase_decoders are UNet-engine "
                                 "tiers; FireNet deploys use --mem_dtype")
            from evflow.deploy import Int8DeployEngine, save_engine

            engine = Int8DeployEngine(model, variables, mem_dtype=args.mem_dtype)
            out = E.export_deploy_engine(engine, args.out, height=H, width=W)
            out["engine_params"] = save_engine(
                engine, os.path.join(args.out, "engine_int8.npz")
            )
    else:
        out = E.export_model(model, variables, args.out, height=H, width=W,
                             quantized=args.quantized)
    for k, v in out.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
