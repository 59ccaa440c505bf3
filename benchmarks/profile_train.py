"""Device trace of the TBPTT train step (reference train scale:
LIFFireNet_short 8ch, 128^2, B=8, P=10, dypack convs) — per-op breakdown
of forward + EventWarping loss + backward + Adam.

Run: python benchmarks/profile_train.py [outdir]
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
import numpy as np
import optax

from evflow.loss.warp_loss import EventWarpingConfig
from evflow.registry import build_model, build_optimizer
from evflow.train import make_train_step, stack_window

B, H, W = 8, 128, 128
P, N = 10, 1000
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace"

cfg = {
    "name": "LIFFireNet_short", "num_bins": 2, "base_num_channels": 8,
    "kernel_size": 3, "encoding": "cnt", "conv_impl": "dypack",
    "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
}
model = build_model(cfg)
states = model.init_states(B, H, W)
cnt0 = jnp.zeros((B, H, W, 2), jnp.float32)
variables = model.init(jax.random.PRNGKey(0), None, cnt0, states)
tx = optax.chain(optax.clip_by_global_norm(1.0),
                 build_optimizer({"name": "Adam", "lr": 2e-4}))
opt_state = tx.init(variables["params"])
warp_cfg = EventWarpingConfig({
    "loader": {"resolution": [H, W]},
    "loss": {"flow_regul_weight": 0.001},
    "model": {"mask_output": True},
})
step_fn = make_train_step(model, tx, warp_cfg)

rng = np.random.default_rng(0)
batches = []
for _ in range(P):
    ys = rng.integers(0, H, (B, N)).astype(np.float32)
    xs = rng.integers(0, W, (B, N)).astype(np.float32)
    ts = np.sort(rng.uniform(0, 1, (B, N)), axis=1).astype(np.float32)
    ps = rng.choice([-1.0, 1.0], (B, N)).astype(np.float32)
    cnt = rng.poisson(0.1, (B, H, W, 2)).astype(np.float32)
    batches.append({
        "event_list": np.stack([ts, ys, xs, ps], -1),
        "event_list_pol_mask": np.stack(
            [(ps > 0).astype(np.float32), (ps < 0).astype(np.float32)], -1),
        "event_valid": np.ones((B, N), np.float32),
        "event_cnt": cnt, "event_voxel": cnt.copy(),
        "event_mask": (cnt.sum(-1, keepdims=True) > 0).astype(np.float32),
    })
window = jax.tree.map(jnp.asarray, stack_window(batches))

params = variables["params"]
bstats = variables.get("batch_stats", {})
loss, params, bstats, opt_state, states, _ = step_fn(
    params, bstats, opt_state, states, window)
float(loss)  # warm

t0 = time.perf_counter()
with jax.profiler.trace(OUT):
    loss, params, bstats, opt_state, states, _ = step_fn(
        params, bstats, opt_state, states, window)
    float(loss)
wall = time.perf_counter() - t0
print(f"step wall {wall*1e3:.1f} ms -> {P*B/wall:.0f} win/s", flush=True)

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
    total = sum(agg.values())
    print(f"\ndevice op totals ({total/1e3:.2f} ms incl parents):")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {dur/1e3:9.3f} ms  {name[:110]}")
