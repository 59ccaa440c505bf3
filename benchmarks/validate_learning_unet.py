"""End-to-end learning validation for the UNet flagship
(SpikingRecEVFlowNet) — the round-3 verdict's missing demonstration.

Same protocol as validate_learning3.py (the measured FireNet recipe:
reference train_SNN.yml hyperparameters, multi-speed multi-quadrant
synthetic sequences, motion-proportional event rate, gtflow AEE at the
matched eval span vs the zero-flow baseline), with the model swapped to
the spiking multires UNet at a reduced channel count (C=16 — the verdict
allows it; the train step is model-generic so every trainer lever applies
unchanged). Matches the reference's flagship training claim
(train_flow.py on SpikingRecEVFlowNet, models/model.py:723-858).

Success bar (VERDICT.md round 3, item 5): trained beats the zero-flow
AEE baseline at the matched span on every sequence.

Result of record (round 4): 8000 steps reach mean AEE 2.907 (-23.7% vs
the 3.811 zero-flow baseline, 5/6 sequences below); resuming via
train(prev_ckpt=<most_recent>) for a further 9000 steps (fresh loader
seed) closes the last sequence — mean AEE 1.762, -53.8%, 6/6 below
baseline (benchmarks/VALIDATION.md "UNet flagship end-to-end learning").
For a one-shot reproduction pass steps=17000 (or run twice with
prev_ckpt, which is what the recorded run did across a session break).

Usage: python benchmarks/validate_learning_unet.py [steps]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from evflow.config import combine_entries
from evflow.data.synthetic import make_dataset
from evflow.eval import evaluate
from evflow.train import train

root = tempfile.mkdtemp(prefix="evflow_learn_unet")
flows = [(30.0, -20.0), (-25.0, 15.0), (45.0, 10.0),
         (-12.0, -38.0), (18.0, 32.0), (-40.0, -8.0)]
# --seed N: independent reproducible draw (dataset instance + loader
# augmentation + model init) for the n>=3 seeds table in VALIDATION.md
SEED = 0
for a in list(sys.argv):
    if a.startswith("--seed"):
        SEED = int(a.split("=")[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
        if "=" not in a:
            sys.argv.remove(sys.argv[sys.argv.index(a) + 1])
        sys.argv.remove(a)
make_dataset(root, num_sequences=6, resolution=(64, 64),
             events_per_sec=250_000, duration=1.0, flows=flows, gt_hz=10.0,
             rate_mode="motion", rate_ref=36.0, seed=SEED)
print(f"synthetic seed={SEED}", flush=True)

cfg = {
    "experiment": "validate_unet",
    "data": {"path": root, "mode": "events", "window": 1000,
             "window_loss": 10000},
    # reference UNet cell family: sigmoid-leak ConvLIF
    # (models/model.py:723-858 builds SpikingMultiResUNetRecurrent from
    # spiking_submodules cells with these init ranges)
    "model": {"name": "SpikingRecEVFlowNet", "encoding": "cnt",
              "round_encoding": False, "num_bins": 2,
              "base_num_channels": 16, "kernel_size": 3,
              "mask_output": True},
    "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.0]},
    "loss": {"flow_regul_weight": 0.001, "clip_grad": 1.0},
    "optimizer": {"name": "Adam", "lr": 0.0002},
    "loader": {"n_epochs": 10000, "batch_size": 4, "resolution": [64, 64],
               "std_resolution": [64, 64],
               "augment": ["Horizontal", "Vertical", "Polarity"],
               "augment_prob": [0.5, 0.5, 0.5], "seed": SEED},
    "vis": {"verbose": True, "store_grads": False, "bars": False},
    "hot_filter": {"enabled": False},
}
cfg = combine_entries(cfg)
steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
run = train(cfg, path_runs=os.path.join(root, "runs"), max_steps=steps,
            verbose=True)

eval_cfg = dict(cfg)
eval_cfg["metrics"] = {"name": ["AEE", "AAE"], "flow_scaling": 64}
eval_cfg["loader"] = dict(cfg["loader"], batch_size=1)

ck = os.path.join(run.dir, "checkpoints", "most_recent")
if os.path.isdir(ck):
    ck = os.path.join(ck, sorted(os.listdir(ck), key=lambda s: int(s))[-1])
else:
    ck = None
print("\ncheckpoint:", ck, flush=True)
gt_mag = {f"seq_{i:03d}.h5": np.hypot(fx * 0.1, fy * 0.1)
          for i, (fx, fy) in enumerate(flows)}

eval_cfg["data"] = {"path": root, "mode": "gtflow_dt1", "window": 0.04}
res_trained = evaluate(eval_cfg, checkpoint=ck, debug=True, verbose=False,
                       chunk=16)
res_random = evaluate(eval_cfg, checkpoint=None, debug=True, verbose=False,
                      chunk=16)
print("\nmatched-span (window=0.04) per-sequence AEE (px; zero-flow "
      "baseline = GT magnitude):", flush=True)
trained_vals, zero_vals, wins = [], [], 0
for f in sorted(res_trained["AEE"]):
    t = float(res_trained["AEE"][f])
    r = float(res_random["AEE"][f])
    z = float(gt_mag.get(f, np.nan))
    trained_vals.append(t)
    zero_vals.append(z)
    wins += t < z
    print(f"  {f}: trained {t:.3f}  random {r:.3f}  zero-flow {z:.3f}"
          f"  {'BEATS baseline' if t < z else 'at/above baseline'}",
          flush=True)
mt, mz = np.mean(trained_vals), np.mean(zero_vals)
print(f"\nmean AEE: trained {mt:.3f} vs zero-flow {mz:.3f} "
      f"({100 * (1 - mt / mz):.1f}% below baseline); "
      f"{wins}/{len(trained_vals)} sequences beat the baseline", flush=True)
