"""Sweep scan-unroll depth on the REAL bench configuration (Int8DeployEngine,
LIFFireNet 32ch, 256x256, B=8, T=64, mem_dtype=mixed) — the headline knob
identified by probe_unroll.py (cross-window pipelining: unrolled scan bodies
let XLA overlap window t+1's early layers with window t's late layers).

Run: python benchmarks/bench_unroll_sweep.py [unrolls...]
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from evflow.deploy import Int8DeployEngine
from evflow.registry import build_model

import os
B, H, W, T = 8, 256, 256, 64
B = int(os.environ.get("EVB", B))  # round-6: retest at B=2 (new optimum)
T = int(os.environ.get("EVT", T))

cfg = {
    "name": "LIFFireNet",
    "num_bins": 2,
    "base_num_channels": 32,
    "kernel_size": 3,
    "encoding": "cnt",
    "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
}
model = build_model(cfg)
states = model.init_states(B, H, W)
key = jax.random.PRNGKey(0)
variables = model.init(key, None, jnp.zeros((B, H, W, 2), jnp.float32), states)
engine = Int8DeployEngine(model, variables, mem_dtype="mixed")
est = engine.init_states(B, H, W)
window = jax.random.poisson(key, 0.05, (B, H, W, 2)).astype(jnp.float32)


def bench(unroll, iters=8):
    def run(params, window, states):
        def step(st, _):
            out, new_st = engine.apply(params, None, window, st)
            return new_st, out["flow"][0].sum()

        final, fsum = jax.lax.scan(step, states, None, length=T, unroll=unroll)
        return fsum.sum(), final

    run_j = jax.jit(run)
    t0 = time.time()
    s, st = run_j(engine.params, window, est)
    float(s)
    cs = time.time() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        s, st = run_j(engine.params, window, st)
        float(s)
        best = min(best, time.perf_counter() - t0)
    print(f"unroll={unroll:2d}: compile {cs:.0f}s, {best/T*1e3:.2f} ms/win "
          f"-> {T*B/best:.0f} win/s", flush=True)
    return T * B / best


if __name__ == "__main__":
    unrolls = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16]
    for u in unrolls:
        bench(u)
