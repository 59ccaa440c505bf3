"""Long-run end-to-end learning validation under the gtflow AEE protocol.

Round-5's short run (validate_learning2.py, 1200 TBPTT steps) proved the
loss landscape and learned the right motion direction/scale at the
training window span, but AEE under the gtflow protocol (0.1 s windows,
25x the training span) stayed near the zero-flow baseline — the expected
gap that full multi-speed training closes (the reference trains 100
epochs on UZH-FPV for the same reason; eval AEE rescales predictions by
dt_gt/dt_input, eval_flow.py:263-317, so the model must map event
density -> speed across spans).

This harness runs that training: SIX synthetic sequences spanning a
3.5x speed range and all four quadrants, tens of thousands of TBPTT
steps (same model/shape config as validate_learning2.py so the jitted
step comes from the persistent cache), then reports protocol AEE for the
trained model vs random init vs the zero-flow baseline (= mean GT
displacement magnitude).

Usage: python benchmarks/validate_learning3.py [steps] [--eval ckpt_dir]
"""
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

root = tempfile.mkdtemp(prefix="evflow_learn3")
# 3.5x speed range, all quadrants, off-axis angles (px/s at 64x64)
flows = [(30.0, -20.0), (-25.0, 15.0), (45.0, 10.0),
         (-12.0, -38.0), (18.0, 32.0), (-40.0, -8.0)]
# --motion: physically-consistent event rate (∝ |flow|, like a real event
# camera / the reference's UZH-FPV data) so event density encodes speed;
# rate_ref=36 ≈ the mean speed keeps the average rate at events_per_sec
RATE_MODE = "motion" if "--motion" in sys.argv else "fixed"
# --norm_input: enable the reference's nonzero-mean/std input normalization
# (models/model.py:164-169) — the designed density conditioner; round-3
# verdict asks whether it yields ONE checkpoint below the zero-flow
# baseline at BOTH the matched (0.04) and full-frame (1.0) eval spans.
NORM_INPUT = "--norm_input" in sys.argv
# --seed N: one knob for an INDEPENDENT, reproducible draw — seeds the
# synthetic dataset instance, the loader's augmentation stream, and the
# model init (train() keys off loader.seed). Used for the n>=3 seeds
# table in benchmarks/VALIDATION.md (round-5 verdict item 3).
SEED = 0
for a in list(sys.argv):
    if a.startswith("--seed"):
        SEED = int(a.split("=")[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
        if "=" not in a:
            sys.argv.remove(sys.argv[sys.argv.index(a) + 1])
        sys.argv.remove(a)
sys.argv = [a for a in sys.argv if a not in ("--motion", "--norm_input")]
make_dataset(root, num_sequences=6, resolution=(64, 64),
             events_per_sec=250_000, duration=1.0, flows=flows, gt_hz=10.0,
             rate_mode=RATE_MODE, rate_ref=36.0, seed=SEED)
print(f"synthetic rate_mode={RATE_MODE} seed={SEED}", flush=True)

cfg = {
    "experiment": "validate3",
    # training recipe = the reference's train_SNN.yml (lr 2e-4, window_loss
    # 10000, flip augmentation): the first run of this harness at lr 5e-4
    # without augmentation collapsed to the zero-flow solution after two
    # epochs (loss 0.83 -> 0.78 -> climbing back to the ~1.10 zero-flow
    # plateau; spiking-activity death), exactly the failure mode the
    # reference's gentler recipe avoids
    "data": {"path": root, "mode": "events", "window": 1000, "window_loss": 10000},
    "model": {"name": "LIFFireNet_short", "encoding": "cnt", "round_encoding": False,
              "num_bins": 2, "base_num_channels": 16, "kernel_size": 3,
              "mask_output": True, "norm_input": NORM_INPUT},
    "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
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
steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
run = train(cfg, path_runs=os.path.join(root, "runs"), max_steps=steps,
            verbose=True)

# Evaluate at TWO window spans. The protocol rescales predictions by
# dt_gt/dt_input (loss/metrics.py _convert_flow, mirroring the reference
# eval_flow.py:263-317), so fractional GT-frame windows are a legitimate
# operating point (the reference's own dt4 protocol evaluates at
# window=0.25). window=0.04 matches the TRAINING input density (1000-event
# ~4 ms windows); window=1 feeds full 0.1 s frames — 25x the training
# event density, far outside the input distribution for this fixed-rate
# synthetic data (real event cameras produce rate ∝ motion, so real eval
# windows stay near the trained density; the constant-rate generator makes
# the full-frame point a pure extrapolation stress test).
eval_cfg = dict(cfg)
eval_cfg["data"] = {"path": root, "mode": "gtflow_dt1", "window": 0.04}
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

for win in (0.04, 1):
    eval_cfg["data"] = dict(eval_cfg["data"], window=win)
    res_trained = evaluate(eval_cfg, checkpoint=ck, debug=True, verbose=False,
                           chunk=16)
    res_random = evaluate(eval_cfg, checkpoint=None, debug=True, verbose=False,
                          chunk=16)
    print(f"\nwindow={win} (input span ~{win * 100:.0f} ms) — per-sequence "
          f"AEE (px; zero-flow baseline = GT magnitude):", flush=True)
    trained_vals, zero_vals = [], []
    for f in sorted(res_trained["AEE"]):
        t = float(res_trained["AEE"][f])
        r = float(res_random["AEE"][f])
        z = float(gt_mag.get(f, np.nan))
        trained_vals.append(t)
        zero_vals.append(z)
        print(f"  {f}: trained {t:.3f}  random {r:.3f}  zero-flow {z:.3f}",
              flush=True)
    mt, mz = np.mean(trained_vals), np.mean(zero_vals)
    print(f"mean AEE @ window={win}: trained {mt:.3f} vs zero-flow {mz:.3f} "
          f"({100 * (1 - mt / mz):.1f}% below baseline)", flush=True)
