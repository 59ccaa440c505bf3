import os, sys, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from evflow.data.synthetic import make_dataset
from evflow.train import train
from evflow.eval import evaluate
from evflow.config import combine_entries

root = tempfile.mkdtemp()
flows = [(30.0, -20.0), (-25.0, 15.0)]
make_dataset(root, num_sequences=2, resolution=(64, 64), events_per_sec=250_000,
             duration=1.0, flows=flows, gt_hz=10.0)

cfg = {
    "experiment": "validate",
    "data": {"path": root, "mode": "events", "window": 1000, "window_loss": 8000},
    "model": {"name": "LIFFireNet_short", "encoding": "cnt", "round_encoding": False,
              "num_bins": 2, "base_num_channels": 16, "kernel_size": 3,
              "mask_output": True},
    "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
    "loss": {"flow_regul_weight": 0.001, "clip_grad": 1.0},
    "optimizer": {"name": "Adam", "lr": 0.0005},
    "loader": {"n_epochs": 10000, "batch_size": 2, "resolution": [64, 64],
               "std_resolution": [64, 64], "augment": [], "seed": 0},
    "vis": {"verbose": True, "store_grads": False, "bars": False},
    "hot_filter": {"enabled": False},
}
cfg = combine_entries(cfg)
steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
run = train(cfg, path_runs=os.path.join(root, "runs"), max_steps=steps, verbose=True)

eval_cfg = dict(cfg)
eval_cfg["data"] = {"path": root, "mode": "gtflow_dt1", "window": 1}
eval_cfg["metrics"] = {"name": ["AEE", "AAE"], "flow_scaling": 64}
eval_cfg["loader"] = dict(cfg["loader"], batch_size=1)

ck = os.path.join(run.dir, "checkpoints", "most_recent")
if os.path.isdir(ck):
    ck = os.path.join(ck, sorted(os.listdir(ck), key=lambda s: int(s))[-1])
else:
    ck = None
print("\ncheckpoint:", ck, flush=True)
res_trained = evaluate(eval_cfg, checkpoint=ck, debug=True, verbose=False)
res_random = evaluate(eval_cfg, checkpoint=None, debug=True, verbose=False)
gt_mag = [np.hypot(fx*0.1, fy*0.1) for fx, fy in flows]
print("GT displacement magnitudes:", [f"{m:.2f}px" for m in gt_mag], flush=True)
for name, res in (("trained", res_trained), ("random", res_random)):
    for f, v in sorted(res["AEE"].items()):
        print(f"{name:8s} AEE {f}: {float(v):.3f} px", flush=True)
