"""Training-step throughput (TBPTT windows/sec) at the reference train config
scale: LIFFireNet_short 8ch, 128x128, batch 8, window 1000 / window_loss
10000 (configs/train_SNN.yml)."""
import sys, os, tempfile; sys.path.insert(0, "/root/repo")
import time, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from evflow.data.synthetic import make_dataset
from evflow.train import train

root = tempfile.mkdtemp()
make_dataset(root, num_sequences=8, resolution=(128, 128), events_per_sec=500_000,
             duration=0.5, gt_hz=10.0)
for dtype_cfg in ({}, {"compute_dtype": "bfloat16"}):
    cfg = {
        "experiment": "bench",
        "data": {"path": root, "mode": "events", "window": 1000, "window_loss": 10000},
        "model": {"name": "LIFFireNet_short", "encoding": "cnt", "round_encoding": False,
                  "num_bins": 2, "base_num_channels": 8, "kernel_size": 3,
                  "mask_output": True, **dtype_cfg},
        "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
        "loss": {"flow_regul_weight": 0.001, "clip_grad": 1.0},
        "optimizer": {"name": "Adam", "lr": 0.0002},
        "loader": {"n_epochs": 10000, "batch_size": 8, "resolution": [128, 128],
                   "std_resolution": [128, 128], "augment": [], "seed": 0},
        "vis": {"verbose": False, "store_grads": False, "bars": False},
        "hot_filter": {"enabled": False},
    }
    from evflow.config import combine_entries
    cfg = combine_entries(cfg)
    t0 = time.time()
    run = train(cfg, path_runs=os.path.join(root, "runs"), max_steps=24, verbose=False)
    dt = time.time() - t0
    # 24 steps x 10 passes x 8 batch = 1920 windows
    t0 = time.time()
    run = train(cfg, path_runs=os.path.join(root, "runs"), max_steps=24, verbose=False)
    dt2 = time.time() - t0
    wps = 24 * 10 * 8 / dt2
    print(f"train {dtype_cfg or 'f32'}: {wps:.0f} win/s ({dt2:.1f}s warm, {dt:.1f}s cold)", flush=True)
