"""Capture a jax.profiler device trace of the real bench step and print the
per-op time breakdown (if the tunneled backend returns device traces).

Run: python benchmarks/profile_bench.py [outdir]
"""
import sys; sys.path.insert(0, "/root/repo")
import glob
import gzip
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from evflow.deploy import Int8DeployEngine
from evflow.registry import build_model

B, H, W, T = 8, 256, 256, 64
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_trace"
if len(sys.argv) > 2:
    B = int(sys.argv[2])
if len(sys.argv) > 3:
    T = int(sys.argv[3])

cfg = {
    "name": "LIFFireNet", "num_bins": 2, "base_num_channels": 32,
    "kernel_size": 3, "encoding": "cnt",
    "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
}
model = build_model(cfg)
states = model.init_states(B, H, W)
key = jax.random.PRNGKey(0)
variables = model.init(key, None, jnp.zeros((B, H, W, 2), jnp.float32), states)
engine = Int8DeployEngine(
    model, variables, mem_dtype=os.environ.get("EVMEM", "mixed"))
est = engine.init_states(B, H, W)
window = jax.random.poisson(key, 0.05, (B, H, W, 2)).astype(jnp.float32)


def run(params, window, states):
    def step(st, _):
        out, new_st = engine.apply(params, None, window, st)
        return new_st, out["flow"][0].sum()

    final, fsum = jax.lax.scan(step, states, None, length=T)
    return fsum.sum(), final


run_j = jax.jit(run)
s, st = run_j(engine.params, window, est)
float(s)  # warm

with jax.profiler.trace(OUT):
    s, st = run_j(engine.params, window, st)
    float(s)

print("trace files:", flush=True)
for root, _, files in os.walk(OUT):
    for f in files:
        p = os.path.join(root, f)
        print(" ", p, os.path.getsize(p))

# try to summarize device op times from the trace.json.gz if present
for p in glob.glob(os.path.join(OUT, "**", "*.trace.json.gz"), recursive=True):
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid names containing TPU / device
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {pid for pid, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "axon" in n.lower()}
    agg = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            agg[name] = agg.get(name, 0.0) + e.get("dur", 0.0)
    if agg:
        total = sum(agg.values())
        print(f"\ndevice op totals from {os.path.basename(p)} "
              f"(total {total/1e3:.2f} ms):")
        for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {dur/1e3:9.3f} ms  {100*dur/total:5.1f}%  {name[:100]}")
    else:
        print(f"\n{os.path.basename(p)}: no device lanes found "
              f"(pids: {list(pid_names.values())[:10]})")
