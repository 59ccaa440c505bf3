"""Density-curriculum training: close the eval-span generalization gap.

validate_learning3.py establishes that full multi-speed training beats the
zero-flow AEE baseline by 36% at the protocol's matched window span, but
stays AT baseline when evaluated on full 0.1 s GT frames — a 25x input-
density extrapolation a net trained on fixed 1000-event windows never saw
(benchmarks/VALIDATION.md round 7). The protocol itself is span-agnostic
(predictions rescale by dt_gt/dt_input, reference eval_flow.py:263-317);
what is missing is training exposure to the eval density.

This harness adds exactly that: a WINDOW-DENSITY CURRICULUM — sequential
train() phases with growing event windows (resumed via prev_ckpt, so Adam
moments carry), ending at the density a full GT frame carries on this
motion-rate synthetic set (~16-32k events). No loader or trainer changes:
each phase is a plain config; the jitted step recompiles per event-list
width and caches. Success = full-frame (window=1) AEE beats the zero-flow
baseline, with the matched-span result preserved.

Usage: python benchmarks/validate_learning4.py [steps_scale]
"""
import os, sys, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from evflow.config import combine_entries
from evflow.data.synthetic import make_dataset
from evflow.eval import evaluate
from evflow.train import train

root = tempfile.mkdtemp(prefix="evflow_learn4")
flows = [(30.0, -20.0), (-25.0, 15.0), (45.0, 10.0),
         (-12.0, -38.0), (18.0, 32.0), (-40.0, -8.0)]
make_dataset(root, num_sequences=6, resolution=(64, 64),
             events_per_sec=250_000, duration=1.0, flows=flows, gt_hz=10.0,
             rate_mode="motion", rate_ref=36.0)

args = [a for a in sys.argv[1:] if not a.startswith("--")]
scale = float(args[0]) if args else 1.0
CYCLES = 1
for a in sys.argv[1:]:
    if a.startswith("--cycles="):
        CYCLES = int(a.split("=", 1)[1])
# (window events, loss-window events, optimizer steps): each phase ~doubles
# the per-window event density; the last phases bracket the density of a
# full 0.1 s GT frame on this data (rate 158-320k ev/s -> 16-32k ev/frame).
# --cycles=N repeats the ladder N times with steps/N each: the monotone
# ladder (N=1) generalizes to full frames but FORGETS the small-window
# regime (sequential fine-tuning; measured: 3.011 at window=1 but 45.5 at
# window=0.04) — cycling interleaves the densities so the final model has
# seen every operating point recently.
PHASES = [
    (1000, 10_000, int(3000 * scale) // CYCLES),
    (4000, 20_000, int(1500 * scale) // CYCLES),
    (12_000, 36_000, int(800 * scale) // CYCLES),
    (24_000, 48_000, int(500 * scale) // CYCLES),
] * CYCLES


def base_cfg(window, window_loss):
    return combine_entries({
        "experiment": "validate4",
        "data": {"path": root, "mode": "events", "window": window,
                 "window_loss": window_loss},
        "model": {"name": "LIFFireNet_short", "encoding": "cnt",
                  "round_encoding": False, "num_bins": 2,
                  "base_num_channels": 16, "kernel_size": 3,
                  "mask_output": True},
        "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
        "loss": {"flow_regul_weight": 0.001, "clip_grad": 1.0},
        "optimizer": {"name": "Adam", "lr": 0.0002},
        "loader": {"n_epochs": 10000, "batch_size": 4, "resolution": [64, 64],
                   "std_resolution": [64, 64],
                   "augment": ["Horizontal", "Vertical", "Polarity"],
                   "augment_prob": [0.5, 0.5, 0.5], "seed": 0},
        "vis": {"verbose": True, "store_grads": False, "bars": False},
        "hot_filter": {"enabled": False},
    })


ck = None
for window, window_loss, steps in PHASES:
    print(f"\n=== phase: window={window} window_loss={window_loss} "
          f"steps={steps} (resume: {ck}) ===", flush=True)
    run = train(base_cfg(window, window_loss),
                path_runs=os.path.join(root, "runs"), prev_ckpt=ck,
                max_steps=steps, verbose=True)
    ckdir = os.path.join(run.dir, "checkpoints", "most_recent")
    if os.path.isdir(ckdir) and os.listdir(ckdir):
        ck = os.path.join(ckdir, sorted(os.listdir(ckdir), key=int)[-1])
    else:
        # phase ended before its first epoch boundary (tiny steps budget):
        # checkpoints are written at epoch end, so keep resuming from the
        # previous phase's checkpoint rather than crashing the whole run
        print(f"phase wrote no checkpoint (steps={steps} < one epoch); "
              f"keeping {ck}", flush=True)

print("\nfinal checkpoint:", ck, flush=True)
gt_mag = {f"seq_{i:03d}.h5": np.hypot(fx * 0.1, fy * 0.1)
          for i, (fx, fy) in enumerate(flows)}
eval_cfg = base_cfg(1000, 10_000)
eval_cfg["metrics"] = {"name": ["AEE", "AAE"], "flow_scaling": 64}
eval_cfg["loader"] = dict(eval_cfg["loader"], batch_size=1, augment=[])

for win in (0.04, 1):
    eval_cfg["data"] = {"path": root, "mode": "gtflow_dt1", "window": win}
    res = evaluate(eval_cfg, checkpoint=ck, debug=True, verbose=False, chunk=16)
    tv, zv = [], []
    print(f"\nwindow={win} — per-sequence AEE (px; zero-flow baseline = "
          f"GT magnitude):", flush=True)
    for f in sorted(res["AEE"]):
        t = float(res["AEE"][f])
        z = float(gt_mag.get(f, np.nan))
        tv.append(t); zv.append(z)
        print(f"  {f}: trained {t:.3f}  zero-flow {z:.3f}", flush=True)
    mt, mz = np.mean(tv), np.mean(zv)
    print(f"mean AEE @ window={win}: trained {mt:.3f} vs zero-flow {mz:.3f} "
          f"({100 * (1 - mt / mz):.1f}% below baseline)", flush=True)
