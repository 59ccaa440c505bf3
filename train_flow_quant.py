"""Quantization-aware training (QAT) of a FireNet-family SNN.

CLI equivalent of the reference train_flow_quant.py:119-555. Modes:
  * full QAT: int8 fake-quant on conv inputs/weights/outputs AND membrane
    state inside the training graph;
  * conv-only QAT (``--conv_only`` or model.quantization.Conv_only): convs
    quantized, membranes fp32;
  * ``--calibration static``: conv activation scales are calibrated ONCE
    from the pretrained FP32 start checkpoint (the reference's brevitas
    semantics — scales collected at calibration, train_flow_quant.py:153-155
    + SNNtorch_spiking_submodules.py:177-208) so the QAT training grid
    matches the deployed PTQ grid; the default ``dynamic`` uses per-batch
    absmax scales.
Starts from a pretrained FP32 checkpoint (``--prev_runid``), like the
reference requires (train_flow_quant.py:239-260).
"""

import argparse


def collect_static_scales(config, prev_ckpt, num_batches=50):
    """Calibrate conv activation scales on the FP32 start checkpoint."""
    import jax
    import jax.numpy as jnp

    from evflow import registry
    from evflow.data.h5_stream import H5EventStream
    from evflow.quant.calibrate import collect_activation_scales
    from evflow.utils.checkpoint import load_checkpoint

    model_cfg = dict(config["model"])
    model_cfg.pop("quantization", None)  # calibrate the unquantized graph
    model = registry.build_model(model_cfg)
    loader = config["loader"]
    B, (H, W) = int(loader.get("batch_size", 1)), loader["resolution"]
    states = model.init_states(B, H, W)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, H, W, model_cfg.get("num_bins", 2)), jnp.float32),
        jnp.zeros((B, H, W, 2), jnp.float32),
        states,
    )
    restored = load_checkpoint(
        prev_ckpt,
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {}),
         "opt_state": None, "epoch": 0, "loss": 0.0, "loss_variance": 0.0},
    )
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}
    stream = H5EventStream(config, model_cfg.get("num_bins", 2))
    try:
        return collect_activation_scales(
            model, variables, stream, num_batches=num_batches
        )
    finally:
        stream.close()


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/train_SNN.yml")
    parser.add_argument("--path_runs", default="runs")
    parser.add_argument("--prev_runid", default="",
                        help="pretrained FP32 checkpoint (strongly recommended)")
    parser.add_argument("--conv_only", action="store_true")
    parser.add_argument("--calibration", choices=("dynamic", "static"),
                        default="dynamic",
                        help="static: calibrate conv-act scales on the FP32 "
                             "start so train and deploy grids agree")
    parser.add_argument("--calibration_batches", type=int, default=50)
    parser.add_argument("--max_steps", type=int, default=None)
    args = parser.parse_args()

    from evflow.config import load_config
    from evflow.train import train

    config = load_config(args.config)
    q = config["model"].setdefault("quantization", {})
    q["enabled"] = True
    if args.conv_only:
        q["Conv_only"] = True
    # weight / LIF-param / quant-scale / gradient histograms every 50 steps
    # (reference train_flow_quant.py:386-462 TensorBoard logging)
    config.setdefault("vis", {})["store_hists"] = True

    if not args.prev_runid:
        print("WARNING: QAT without a pretrained FP32 start typically fails to "
              "converge (reference guard at train_flow_quant.py:239-260).")

    if args.calibration == "static":
        if not args.prev_runid:
            raise SystemExit(
                "--calibration static needs --prev_runid: the scales are "
                "collected from the pretrained FP32 checkpoint"
            )
        scales = collect_static_scales(
            config, args.prev_runid, num_batches=args.calibration_batches
        )
        q["static_scales"] = {k: float(v) for k, v in scales.items()}
        print(f"calibrated {len(scales)} static conv-act scales "
              f"({args.calibration_batches} batches)")

    run = train(
        config,
        path_runs=args.path_runs,
        prev_ckpt=args.prev_runid or None,
        max_steps=args.max_steps,
    )
    print(f"\nRun dir: {run.dir}")


if __name__ == "__main__":
    main()
