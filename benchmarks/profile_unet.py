"""Capture a jax.profiler device trace of the UNet int8 engine step and
print the per-op time breakdown (the UNet analog of profile_bench.py).

Run: python benchmarks/profile_unet.py [outdir] [res] [T] [compute[+phase]]
"""
import sys; sys.path.insert(0, "/root/repo")
import glob
import gzip
import json
import os

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from evflow.deploy_unet import Int8UNetEngine
from evflow.registry import build_model

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/unet_trace"
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 256
T = int(sys.argv[3]) if len(sys.argv) > 3 else 256
TIER = sys.argv[4] if len(sys.argv) > 4 else "hybrid+phase"
compute, _, suffix = TIER.partition("+")
B = 1

cfg = {
    "name": "SpikingRecEVFlowNet", "num_bins": 2, "base_num_channels": 32,
    "kernel_size": 3, "encoding": "cnt",
    "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.0]},
}
model = build_model(cfg)
states = model.init_states(B, RES, RES)
key = jax.random.PRNGKey(0)
variables = model.init(key, None, jnp.zeros((B, RES, RES, 2), jnp.float32), states)
engine = Int8UNetEngine(model, variables, compute=compute,
                        phase_decoders=(suffix == "phase"))
est = engine.init_states(B, RES, RES)
window = jax.random.poisson(key, 0.05, (B, RES, RES, 2)).astype(jnp.float32)


def run(params, window, states):
    def step(st, _):
        out, new_st = engine.apply(params, None, window, st)
        return new_st, out["flow"][-1].sum()

    final, fsum = jax.lax.scan(step, states, None, length=T)
    return fsum.sum(), final


run_j = jax.jit(run)
s, st = run_j(engine.params, window, est)
float(s)  # warm

with jax.profiler.trace(OUT):
    s, st = run_j(engine.params, window, st)
    float(s)

for p in glob.glob(os.path.join(OUT, "**", "*.trace.json.gz"), recursive=True):
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
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
              f"(total {total/1e3:.2f} ms, {total/1e3/T:.4f} ms/step):")
        for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
            print(f"  {dur/1e3:9.3f} ms  {100*dur/total:5.1f}%  {name[:100]}")
    else:
        print(f"\n{os.path.basename(p)}: no device lanes found "
              f"(pids: {list(pid_names.values())[:10]})")
