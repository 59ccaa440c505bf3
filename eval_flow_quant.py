"""Quantized evaluation: PTQ / hybrid / mixed-precision / full QAT.

CLI equivalent of the reference eval_flow_quant.py:883-1680. Modes:
  ptq      — load FP32 checkpoint, int8 convs + int8 membranes
             (optionally --auto_tune_lif per-layer membrane ranges);
  hybrid   — conv-only-QAT checkpoint + PTQ membranes;
  mixed    — conv-only-QAT checkpoint, fp32 membranes;
  full_qat — fully QAT-trained checkpoint, no calibration.
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint", help="checkpoint path / reference .pth")
    parser.add_argument("--config", default="configs/eval_MVSEC.yml")
    parser.add_argument("--mode", default="ptq",
                        choices=["ptq", "hybrid", "mixed", "full_qat"])
    parser.add_argument("--calibration_batches", type=int, default=50)
    parser.add_argument("--auto_tune_lif", action="store_true",
                        help="profile per-layer membrane ranges")
    parser.add_argument("--profile_batches", type=int, default=100)
    parser.add_argument("--path_results", default="results_inference/")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--max_windows", type=int, default=None)
    args = parser.parse_args()

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
        variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}

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
        max_windows=args.max_windows,
    )

    print()
    for metric, per_file in results.items():
        for fname, val in per_file.items():
            print(f"{metric:16s} {fname:32s} {val}")


if __name__ == "__main__":
    main()
