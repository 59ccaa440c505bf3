"""Quantized evaluation: PTQ / hybrid / mixed-precision / full QAT / deploy.

CLI equivalent of the reference eval_flow_quant.py:883-1680. Modes:
  ptq      — load FP32 checkpoint, int8 convs + int8 membranes
             (optionally --auto_tune_lif per-layer membrane ranges);
  hybrid   — conv-only-QAT checkpoint + PTQ membranes;
  mixed    — conv-only-QAT checkpoint, fp32 membranes;
  full_qat — fully QAT-trained checkpoint, no calibration;
  deploy   — the real int8 serving engine (evflow/deploy.py): folded BN,
             hoisted per-channel int8 weights, int8 spike carries, actual
             int8 MXU GEMMs (not fake-quant). ``--mem_dtype int8`` adds
             int8 membranes (ranges auto-profiled), ``--z_int8`` adds
             calibrated int8 GEMM intermediates — the fastest tier.
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint", nargs="?", default=None,
                        help="checkpoint path / reference .pth (not needed "
                             "with --mode deploy --artifact)")
    parser.add_argument("--config", default="configs/eval_MVSEC.yml")
    parser.add_argument("--mode", default="ptq",
                        choices=["ptq", "hybrid", "mixed", "full_qat", "deploy"])
    parser.add_argument("--artifact", default=None,
                        help="deploy mode: acceptance-evaluate a save_engine "
                             ".npz artifact under the full AEE protocol "
                             "(the artifact fixes tier/input_scale/z-config; "
                             "--mem_dtype/--z_int8 are rejected)")
    parser.add_argument("--mem_dtype", default="bfloat16",
                        choices=["bfloat16", "int8", "mixed"],
                        help="deploy mode: membrane carry dtype (mixed = "
                             "bf16 head membrane, int8 elsewhere)")
    parser.add_argument("--compute", default="hybrid",
                        choices=["bfloat16", "int8", "hybrid", "hybrid8"],
                        help="deploy mode, UNet engine only: conv compute "
                             "tier carrying the same integer arithmetic "
                             "(bf16 wins at <=128 res, s8 at 256 — "
                             "BENCH_NOTES)")
    parser.add_argument("--phase_decoders", action="store_true",
                        help="deploy mode, UNet engine only: fold the "
                             "decoder bilinear x2 into 4 low-res kernels "
                             "(2.4x f32 serving; 1-2 px border divergence "
                             "— BENCH_NOTES)")
    parser.add_argument("--z_int8", action="store_true",
                        help="deploy mode: calibrated int8 GEMM intermediates")
    parser.add_argument("--calibration_batches", type=int, default=50)
    parser.add_argument("--auto_tune_lif", action="store_true",
                        help="profile per-layer membrane ranges")
    parser.add_argument("--profile_batches", type=int, default=100)
    parser.add_argument("--path_results", default="results_inference/")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--max_windows", type=int, default=None)
    parser.add_argument("--chunk", type=int, default=1,
                        help="scan K windows per device dispatch (identical "
                             "metrics; amortizes per-dispatch latency on "
                             "remote/tunneled hosts)")
    parser.add_argument("--device_metrics", action="store_true",
                        help="compute the metric protocol in-graph (needs "
                             "--chunk>1); flow maps never leave the device")
    args = parser.parse_args()
    if args.artifact:
        if args.mode != "deploy":
            parser.error("--artifact requires --mode deploy")
        if args.checkpoint is not None:
            parser.error("pass a checkpoint OR --artifact, not both (the "
                         "artifact already contains the prepared parameters)")
        if args.mem_dtype != "bfloat16" or args.z_int8:
            parser.error("--mem_dtype/--z_int8 cannot override an artifact: "
                         "its prepared parameters fix the tier and z-config")
    elif args.checkpoint is None:
        parser.error("a checkpoint is required (or --mode deploy --artifact)")

    import jax
    import jax.numpy as jnp

    from evflow import registry
    from evflow.config import load_config
    from evflow.eval import evaluate
    from evflow.quant.calibrate import calibrate_model_ptq

    config = load_config(args.config)
    model_cfg = config["model"]
    model = registry.build_model(model_cfg)
    H, W = config["loader"]["resolution"]
    B = int(config["loader"].get("batch_size", 1))
    states = model.init_states(B, H, W)
    variables = model.init(
        jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states
    )
    if args.artifact:
        pass  # the artifact carries the prepared parameters
    elif args.checkpoint.endswith((".pth", ".pt")):
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
        variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}

    if args.mode == "deploy":
        from evflow.data.h5_stream import H5EventStream
        from evflow.deploy import Int8DeployEngine

        is_unet = model.__class__.__name__ == "SpikingRecEVFlowNet"
        if args.artifact:
            # dispatch on the artifact's own model record: the two engine
            # families serialize different parameter layouts
            import json

            import numpy as np

            with np.load(args.artifact, allow_pickle=False) as z:
                meta_model = json.loads(str(z["__meta__"])).get("model")
            if meta_model == "SpikingRecEVFlowNet":
                from evflow.deploy_unet import Int8UNetEngine

                engine = Int8UNetEngine.from_artifact(model, args.artifact)
            else:
                engine = Int8DeployEngine.from_artifact(model, args.artifact)
            print("=== quantized evaluation: mode=deploy (artifact "
                  "acceptance) ===")
            print(f"artifact: {args.artifact}")
            print(f"membranes: {engine.mem_dtype}; GEMM intermediates: "
                  f"{'calibrated int8' if getattr(engine, 'z_int8', False) else 'bf16'}")
            results = evaluate(
                config, variables=engine.params, model=engine,
                path_results=args.path_results,
                runid="quant_deploy", debug=args.debug,
                max_windows=args.max_windows, chunk=args.chunk,
            device_metrics=args.device_metrics,
            )
            for metric, per_file in results.items():
                for fname, val in per_file.items():
                    print(f"{metric:16s} {fname:32s} {val}")
            return

        encoding = model_cfg.get("encoding", "cnt")
        wkey = "event_voxel" if encoding == "voxel" else "event_cnt"
        if is_unet:
            if args.z_int8:
                parser.error("--z_int8 applies to the FireNet dy-pack "
                             "engine; the UNet engine has no Z buffer")
            if args.mem_dtype != "bfloat16":
                parser.error("the UNet engine carries bf16 membranes "
                             "(int8/mixed tiers are FireNet-engine only)")
        input_scale = 1.0
        if encoding == "cnt":
            # pooled counts are exact multiples of 1/(ph*pw); scale the
            # engine's int8 input grid accordingly (exact, no rounding loss)
            th, tw = config["loader"]["resolution"]
            sh, sw = config["loader"].get("std_resolution", [th, tw])
            if (sh, sw) != (th, tw):
                input_scale = 1.0 / ((sh // th) * (sw // tw))
        mem_ranges = None
        need_windows = args.mem_dtype in ("int8", "mixed") or encoding == "voxel"
        if need_windows:
            stream = H5EventStream(config, model_cfg.get("num_bins", 2),
                                   model_cfg.get("round_encoding", False))
            windows = [stream.next_batch()[wkey]
                       for _ in range(args.profile_batches)]
            if encoding == "voxel":
                # fractional voxel inputs need a calibrated int8 input grid
                import numpy as np

                input_scale = max(
                    float(np.max(np.abs(np.asarray(w)))) for w in windows
                ) / 127.0 or 1.0
            if args.mem_dtype in ("int8", "mixed"):
                from evflow.deploy import profile_mem_ranges

                mem_ranges = profile_mem_ranges(model, variables, windows,
                                                input_scale=input_scale)
        if is_unet:
            from evflow.deploy_unet import Int8UNetEngine

            engine = Int8UNetEngine(model, variables, input_scale=input_scale,
                                    compute=args.compute,
                                    phase_decoders=args.phase_decoders)
        else:
            engine = Int8DeployEngine(
                model, variables, mem_dtype=args.mem_dtype,
                mem_ranges=mem_ranges, input_scale=input_scale,
            )
        if args.z_int8:
            stream = H5EventStream(config, model_cfg.get("num_bins", 2),
                                   model_cfg.get("round_encoding", False))
            windows = [
                stream.next_batch()["event_cnt"]
                for _ in range(args.calibration_batches)
            ]
            engine.calibrate_z(windows)

        print("=== quantized evaluation: mode=deploy (real int8 serving engine) ===")
        print(f"weights: per-channel int8 (folded BN); spikes: int8 carries")
        print(f"membranes: {args.mem_dtype}"
              + (" (profiled per-channel asymmetric ranges)" if mem_ranges else ""))
        print(f"GEMM intermediates: {'calibrated int8' if args.z_int8 else 'bf16'}")
        results = evaluate(
            config, variables=engine.params, model=engine,
            path_results=args.path_results,
            runid="quant_deploy", debug=args.debug,
            max_windows=args.max_windows, chunk=args.chunk,
            device_metrics=args.device_metrics,
        )
        for metric, per_file in results.items():
            for fname, val in per_file.items():
                print(f"{metric:16s} {fname:32s} {val}")
        return

    mode_map = {"ptq": "full", "hybrid": "states_only", "mixed": None, "full_qat": None}
    qmode = mode_map[args.mode]
    if qmode is not None:
        qmodel, variables = calibrate_model_ptq(
            config, variables, mode=qmode,
            num_batches=args.calibration_batches,
            auto_tune=args.auto_tune_lif,
            profile_batches=args.profile_batches,
        )
    elif args.mode == "full_qat":
        from evflow.quant.fake_quant import dynamic_conv_quant, state_quant_fn

        qmodel = registry.build_model(model_cfg).clone(
            state_quant=state_quant_fn(), conv_fake_quant=dynamic_conv_quant()
        )
    else:  # mixed: conv-quant only
        from evflow.quant.fake_quant import dynamic_conv_quant

        qmodel = registry.build_model(model_cfg).clone(
            conv_fake_quant=dynamic_conv_quant()
        )

    # quantization info report (eval_flow_quant.py print_quantization_info :30-183)
    from evflow.models.summary import summarize

    print(f"=== quantized evaluation: mode={args.mode} ===")
    print(summarize(variables, config["model"].get("name", "model")))
    print(f"conv fake-quant: {'int8 dynamic per-tensor' if qmodel.conv_fake_quant else 'disabled (fp32)'}")
    if qmodel.state_quant_per_layer is not None:
        print("membrane quant: per-layer auto-tuned ranges")
    elif qmodel.state_quant is not None:
        print("membrane quant: int8 uniform [-250, 1] (snntorch default)")
    else:
        print("membrane quant: disabled (fp32 membranes)")

    results = evaluate(
        config, variables=variables, model=qmodel,
        path_results=args.path_results,
        runid=f"quant_{args.mode}", debug=args.debug,
        max_windows=args.max_windows, chunk=args.chunk,
            device_metrics=args.device_metrics,
    )

    print()
    for metric, per_file in results.items():
        for fname, val in per_file.items():
            print(f"{metric:16s} {fname:32s} {val}")


if __name__ == "__main__":
    main()
