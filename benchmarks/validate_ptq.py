"""End-to-end PTQ accuracy parity: train a small LIFFireNet_short on synthetic
data with known GT flow, then compare fp32 vs int8-PTQ AEE under the full
evaluation protocol (reference workflow: train_flow.py -> eval_flow_quant.py
--mode ptq). Expected: PTQ AEE within a few percent of fp32 (the reference
reports near-parity for conv-only and modest degradation for full PTQ).

Runs on CPU (forced platform) — this is a numerics check, not a perf bench.
"""
import sys, os, tempfile
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import glob
import numpy as np
from evflow.config import combine_entries
from evflow.data.synthetic import make_dataset
from evflow.train import train
from evflow.eval import evaluate
from evflow.registry import build_model
from evflow.utils.checkpoint import load_checkpoint
from evflow.quant.calibrate import calibrate_model_ptq

root = tempfile.mkdtemp()
make_dataset(root, num_sequences=2, resolution=(64, 64), events_per_sec=120_000,
             duration=1.0, flows=[(12.0, -8.0), (-10.0, 6.0)], gt_hz=10.0)

base_model_cfg = {
    "name": "LIFFireNet_short", "encoding": "cnt", "round_encoding": False,
    "norm_input": False, "num_bins": 2, "base_num_channels": 8,
    "kernel_size": 3, "mask_output": True,
    "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8],
                       "learn_leak": True, "learn_thresh": True, "hard_reset": True},
}
tcfg = combine_entries({
    "experiment": "ptq_check",
    "data": {"path": root, "mode": "events", "window": 500, "window_loss": 2500},
    "model": base_model_cfg,
    "loss": {"flow_regul_weight": 0.001, "clip_grad": 1.0},
    "optimizer": {"name": "Adam", "lr": 0.002},
    "loader": {"n_epochs": 10000, "batch_size": 2, "resolution": [64, 64],
               "std_resolution": [64, 64], "augment": [], "seed": 0},
    "vis": {"verbose": False, "store_grads": False, "bars": False},
    "hot_filter": {"enabled": False},
})
run = train(tcfg, path_runs=os.path.join(root, "runs"), max_steps=150, verbose=False)
ck = glob.glob(os.path.join(run.dir, "checkpoints", "most_recent", "*"))[0]
print("trained:", ck, flush=True)

ecfg = combine_entries({
    "experiment": "ptq_check",
    "data": {"path": root, "mode": "gtflow_dt1", "window": 1},
    "model": base_model_cfg,
    "metrics": {"name": ["AEE"], "flow_scaling": 64, "heat_map": False},
    "loader": {"batch_size": 1, "resolution": [64, 64], "std_resolution": [64, 64],
               "augment": [], "seed": 0},
    "vis": {"verbose": False, "enabled": False, "bars": False},
    "hot_filter": {"enabled": False},
})

model = build_model(ecfg["model"])
st = model.init_states(1, 64, 64)
import jax.numpy as jnp
v0 = model.init(jax.random.PRNGKey(0), None, jnp.zeros((1, 64, 64, 2)), st, train=False)
tmpl = {"params": v0["params"], "batch_stats": v0.get("batch_stats", {}),
        "opt_state": None, "epoch": 0, "loss": 0.0, "loss_variance": 0.0}
restored = load_checkpoint(ck, tmpl)
variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}

def run_eval(m, tag):
    res = evaluate(ecfg, path_results=os.path.join(root, "res", tag), debug=True,
                   model=m, variables=variables, max_windows=16, verbose=False)
    aee = float(np.mean([float(x) for x in res["AEE"].values()]))
    print(f"{tag}: AEE {aee:.4f}", flush=True)
    return aee

a_fp32 = run_eval(model, "fp32")
for mode in ("conv_only", "states_only", "full"):
    qcfg = dict(ecfg); qcfg["data"] = dict(ecfg["data"])
    qm, _ = calibrate_model_ptq(qcfg, variables, mode=mode, auto_tune=False)
    a_q = run_eval(qm, f"ptq_{mode}")
    print(f"ptq_{mode}: delta {100*(a_q-a_fp32)/max(a_fp32,1e-9):+.2f}%", flush=True)
# auto-tuned membrane ranges (the reference's --auto_tune_lif path)
qcfg = dict(ecfg); qcfg["data"] = {"path": root, "mode": "events", "window": 500}
qm, _ = calibrate_model_ptq(qcfg, variables, mode="full", auto_tune=True, profile_batches=20)
a_at = run_eval(qm, "ptq_full_autotune")
print(f"ptq_full_autotune: delta {100*(a_at-a_fp32)/max(a_fp32,1e-9):+.2f}%", flush=True)
