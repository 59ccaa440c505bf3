"""Measure evaluate(chunk=K) wall speedup on a dispatch-latency-bound rig.

The eval protocol is host-side per window; chunk=K scans K windows per
device dispatch (evflow/eval.py make_chunk_eval_step), amortizing the
~35 ms tunnel roundtrip. Metrics are asserted identical.

Run: python benchmarks/bench_eval_chunk.py
"""
import sys; sys.path.insert(0, "/root/repo")
import os
import tempfile
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from evflow.data.synthetic import make_dataset
from evflow.eval import evaluate
from evflow.registry import build_model

RES = 64
root = os.path.join(tempfile.gettempdir(), "evflow_chunk_bench")
if not os.path.isdir(root):
    make_dataset(root, num_sequences=1, resolution=(RES, RES),
                 events_per_sec=60_000, duration=4.0, flows=[(12.0, -8.0)],
                 gt_hz=20.0)

cfg = {
    "data": {"path": root, "mode": "gtflow_dt1", "window": 1},
    "model": {
        "name": "LIFFireNet_short", "encoding": "cnt", "num_bins": 2,
        "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
        "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
    },
    "loader": {"resolution": [RES, RES], "std_resolution": [RES, RES],
               "batch_size": 1, "augment": [], "seed": 0},
    "hot_filter": {"enabled": False},
    "vis": {"bars": False},
    "metrics": {"name": ["AEE"], "flow_scaling": RES},
    "loss": {},
}

model = build_model(cfg["model"])
states = model.init_states(1, RES, RES)
v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((1, RES, RES, 2)), states)

results = {}
for chunk in (1, 16, 64):
    t0 = time.perf_counter()
    r = evaluate(cfg, model=model, variables=v, debug=True, verbose=False,
                 max_windows=64, chunk=chunk)
    # warm timing pass (first pass paid the compiles)
    t0 = time.perf_counter()
    r = evaluate(cfg, model=model, variables=v, debug=True, verbose=False,
                 max_windows=64, chunk=chunk)
    dt = time.perf_counter() - t0
    aee = {k: float(x) for k, x in r["AEE"].items()}
    results[chunk] = aee
    print(f"chunk={chunk:3d}: {64/dt:7.1f} win/s wall  AEE={aee}", flush=True)

# chunked metrics run on the host CPU backend (one flow fetch per chunk);
# CPU vs TPU f32 elementwise rounding differs in the last ulps only
for c, aee in results.items():
    for k in aee:
        rel = abs(aee[k] - results[1][k]) / abs(results[1][k])
        assert rel < 1e-6, (c, k, aee[k], results[1][k])
print("metrics agree across chunk settings (rel < 1e-6) OK")
