"""Real-bench micro knobs: scan length T (dispatch amortization) and buffer
donation (state double-buffer elimination) on the exact bench configuration.

Run: python benchmarks/bench_micro_knobs.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from evflow.deploy import Int8DeployEngine
from evflow.registry import build_model

B, H, W = 8, 256, 256

cfg = {
    "name": "LIFFireNet", "num_bins": 2, "base_num_channels": 32,
    "kernel_size": 3, "encoding": "cnt",
    "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
}
model = build_model(cfg)
states = model.init_states(B, H, W)
key = jax.random.PRNGKey(0)
variables = model.init(key, None, jnp.zeros((B, H, W, 2), jnp.float32), states)
engine = Int8DeployEngine(model, variables, mem_dtype="mixed")
window = jax.random.poisson(key, 0.05, (B, H, W, 2)).astype(jnp.float32)


def bench(T, donate, iters=8):
    def run(params, window, states):
        def step(st, _):
            out, new_st = engine.apply(params, None, window, st)
            return new_st, out["flow"][0].sum()

        final, fsum = jax.lax.scan(step, states, None, length=T)
        return fsum.sum(), final

    run_j = jax.jit(run, donate_argnums=(2,) if donate else ())
    est = engine.init_states(B, H, W)
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
    print(f"T={T:3d} donate={int(donate)}: compile {cs:.0f}s, "
          f"{best/T*1e3:.3f} ms/win -> {T*B/best:.0f} win/s", flush=True)


if __name__ == "__main__":
    for T, donate in ((64, False), (64, True), (128, False), (128, True),
                      (256, True)):
        bench(T, donate)
