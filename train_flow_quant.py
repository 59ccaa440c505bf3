"""Quantization-aware training (QAT) of a FireNet-family SNN.

CLI equivalent of the reference train_flow_quant.py:119-555. Modes:
  * full QAT: int8 fake-quant on conv inputs/weights/outputs AND membrane
    state inside the training graph;
  * conv-only QAT (``--conv_only`` or model.quantization.Conv_only): convs
    quantized, membranes fp32.
Starts from a pretrained FP32 checkpoint (``--prev_runid``), like the
reference requires (train_flow_quant.py:239-260).
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/train_SNN.yml")
    parser.add_argument("--path_runs", default="runs")
    parser.add_argument("--prev_runid", default="",
                        help="pretrained FP32 checkpoint (strongly recommended)")
    parser.add_argument("--conv_only", action="store_true")
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

    run = train(
        config,
        path_runs=args.path_runs,
        prev_ckpt=args.prev_runid or None,
        max_steps=args.max_steps,
    )
    print(f"\nRun dir: {run.dir}")


if __name__ == "__main__":
    main()
