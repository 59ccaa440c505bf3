"""Measure actual AEE deltas of each deploy-engine tier vs f32 on the
synthetic gtflow protocol (the test asserts budgets; this prints numbers
for BENCH_NOTES.md / headline selection). CPU-runnable."""
import sys; sys.path.insert(0, "/root/repo")
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from evflow.config import combine_entries
from evflow.data.h5_stream import H5EventStream
from evflow.data.synthetic import make_dataset
from evflow.deploy import Int8DeployEngine
from evflow.eval import evaluate
from evflow.registry import build_model
from evflow.train import train
from evflow.utils.checkpoint import load_checkpoint

RES = 64


MODEL = "LIFFireNet" if "--full" in sys.argv else "LIFFireNet_short"


def model_cfg(**over):
    cfg = {
        "name": MODEL, "encoding": "cnt", "round_encoding": False,
        "norm_input": False, "num_bins": 2, "base_num_channels": 8,
        "kernel_size": 3, "mask_output": True,
        "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8],
                           "learn_leak": True, "learn_thresh": True,
                           "hard_reset": True},
    }
    cfg.update(over)
    return cfg


def main():
    base = tempfile.mkdtemp(prefix="deploy_tiers_")
    train_root = os.path.join(base, "train")
    root = os.path.join(base, "eval")
    make_dataset(train_root, num_sequences=2, resolution=(RES, RES),
                 events_per_sec=120_000, duration=1.0,
                 flows=[(12.0, -8.0), (-10.0, 6.0)], gt_hz=10.0)
    make_dataset(root, num_sequences=1, resolution=(RES, RES),
                 events_per_sec=120_000, duration=4.0,
                 flows=[(12.0, -8.0)], gt_hz=60.0)
    tcfg = combine_entries({
        "experiment": "tiers",
        "data": {"path": train_root, "mode": "events", "window": 500,
                 "window_loss": 2500},
        "model": model_cfg(),
        "loss": {"flow_regul_weight": 0.001, "clip_grad": 1.0},
        "optimizer": {"name": "Adam", "lr": 0.002},
        "loader": {"n_epochs": 10000, "batch_size": 2, "resolution": [RES, RES],
                   "std_resolution": [RES, RES], "augment": [], "seed": 0},
        "vis": {"verbose": False, "store_grads": False, "bars": False},
        "hot_filter": {"enabled": False},
    })
    run = train(tcfg, path_runs=os.path.join(train_root, "runs"),
                max_steps=150, verbose=False)
    import glob
    ck = glob.glob(os.path.join(run.dir, "checkpoints", "most_recent", "*"))[0]
    model = build_model(model_cfg())
    st = model.init_states(1, RES, RES)
    v0 = model.init(jax.random.PRNGKey(0), None, jnp.zeros((1, RES, RES, 2)), st)
    restored = load_checkpoint(ck, {"params": v0["params"],
                                    "batch_stats": v0.get("batch_stats", {}),
                                    "opt_state": None, "epoch": 0, "loss": 0.0,
                                    "loss_variance": 0.0})
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}

    ecfg = combine_entries({
        "experiment": "tiers",
        "data": {"path": root, "mode": "gtflow_dt1", "window": 1},
        "model": model_cfg(),
        "metrics": {"name": ["AEE"], "flow_scaling": RES, "heat_map": False},
        "loader": {"batch_size": 1, "resolution": [RES, RES],
                   "std_resolution": [RES, RES], "augment": [], "seed": 0},
        "vis": {"verbose": False, "enabled": False, "bars": False},
        "hot_filter": {"enabled": False},
    })

    def aee(m, v, tag):
        r = evaluate(ecfg, path_results=os.path.join(base, "r", tag), debug=True,
                     model=m, variables=v, max_windows=230, verbose=False)
        return float(np.mean([float(x) for x in r["AEE"].values()]))

    a_f32 = aee(model, variables, "f32")
    print(f"f32                 : AEE {a_f32:.5f}", flush=True)

    e1 = Int8DeployEngine(model, variables)
    a = aee(e1, e1.params, "d_bf16")
    print(f"deploy bf16-mem     : AEE {a:.5f}  rel {abs(a-a_f32)/a_f32*100:.2f}%", flush=True)

    # profiled per-channel asymmetric membrane ranges
    from evflow.deploy import profile_mem_ranges

    data = H5EventStream(ecfg, 2, False)
    prof_windows = [data.next_batch()["event_cnt"] for _ in range(40)]
    ranges = profile_mem_ranges(model, variables, prof_windows)

    e2 = Int8DeployEngine(model, variables, mem_dtype="int8", mem_ranges=ranges)
    a = aee(e2, e2.params, "d_i8m")
    print(f"deploy int8-mem     : AEE {a:.5f}  rel {abs(a-a_f32)/a_f32*100:.2f}%", flush=True)

    data = H5EventStream(ecfg, 2, False)
    windows = [data.next_batch()["event_cnt"] for _ in range(25)]
    e3 = Int8DeployEngine(model, variables, mem_dtype="int8", mem_ranges=ranges)
    e3.calibrate_z(windows)
    a = aee(e3, e3.params, "d_z")
    print(f"deploy int8-mem+zi8 : AEE {a:.5f}  rel {abs(a-a_f32)/a_f32*100:.2f}%", flush=True)

    e4 = Int8DeployEngine(model, variables)
    e4.calibrate_z(windows)
    a = aee(e4, e4.params, "d_zb")
    print(f"deploy bf16-mem+zi8 : AEE {a:.5f}  rel {abs(a-a_f32)/a_f32*100:.2f}%", flush=True)

    e5 = Int8DeployEngine(model, variables, mem_dtype="mixed", mem_ranges=ranges)
    a = aee(e5, e5.params, "d_mixed")
    print(f"deploy mixed-mem    : AEE {a:.5f}  rel {abs(a-a_f32)/a_f32*100:.2f}%", flush=True)

    if "--sweep" in sys.argv:
        # mixed-membrane sweep: which units tolerate int8 membranes?
        names = list(model.unit_names)
        n = len(names)

        def mixed(tags):
            dts = ["int8" if i in tags else "bfloat16" for i in range(n)]
            e = Int8DeployEngine(model, variables, mem_dtype=dts, mem_ranges=ranges)
            label = "".join("i" if i in tags else "b" for i in range(n))
            a = aee(e, e.params, f"mx_{label}")
            print(f"mixed {label} ({','.join(names[i] for i in tags) or 'none'}"
                  f" int8): AEE {a:.5f}  rel {abs(a-a_f32)/a_f32*100:+.2f}%",
                  flush=True)
            return a

        for i in range(n):            # only unit i int8 — per-unit sensitivity
            mixed({i})
        rec = {i for i, r in enumerate(model.unit_names) if r in ("G1", "G2")}
        mixed(set(range(n)) - rec)    # all FF int8, recurrent bf16
        mixed(rec)                    # only recurrent int8
        for i in range(n):            # leave-one-out bf16
            mixed(set(range(n)) - {i})


if __name__ == "__main__":
    main()
