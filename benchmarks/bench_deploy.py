"""Real-model bench of the int8 deployment engine (evflow/deploy.py):
LIFFireNet 32ch @ 256x256, B=8 sequences, scan over T windows."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from evflow.deploy import Int8DeployEngine
from evflow.registry import build_model

B, H, W, T = 8, 256, 256, 64


def bench(mem_dtype, z_int8=False, iters=4):
    cfg = {
        "name": "LIFFireNet", "num_bins": 2, "base_num_channels": 32,
        "kernel_size": 3, "encoding": "cnt",
        "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
    }
    model = build_model(cfg)
    states = model.init_states(B, H, W)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, None, jnp.zeros((B, H, W, 2), jnp.float32), states)
    engine = Int8DeployEngine(model, variables, mem_dtype=mem_dtype)
    est = engine.init_states(B, H, W)
    window = jax.random.poisson(key, 0.05, (B, H, W, 2)).astype(jnp.float32)
    if z_int8:
        engine.calibrate_z([window] * 4)

    @jax.jit
    def run(params, window, states):
        def step(st, _):
            out, new_st = engine.apply(params, None, window, st)
            return new_st, out["flow"][0].sum()
        final, fsum = jax.lax.scan(step, states, None, length=T)
        return fsum.sum(), final

    t0 = time.time(); s, st = run(engine.params, window, est); float(s)
    cs = time.time() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter(); s, st = run(engine.params, window, st); float(s)
        best = min(best, time.perf_counter() - t0)
    tag = f"mem={mem_dtype}{' z=int8' if z_int8 else ''}"
    print(f"deploy {tag:22s}: compile {cs:.0f}s, {T*B/best:.1f} win/s", flush=True)


def bench_latency(mem_dtype="int8", T=64, iters=4):
    """B=1 single-stream serving latency (ms per 256x256 window)."""
    global B
    saved, B = B, 1
    try:
        cfg = {
            "name": "LIFFireNet", "num_bins": 2, "base_num_channels": 32,
            "kernel_size": 3, "encoding": "cnt",
            "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
        }
        model = build_model(cfg)
        states = model.init_states(1, H, W)
        key = jax.random.PRNGKey(0)
        variables = model.init(key, None, jnp.zeros((1, H, W, 2), jnp.float32), states)
        engine = Int8DeployEngine(model, variables, mem_dtype=mem_dtype)
        est = engine.init_states(1, H, W)
        window = jax.random.poisson(key, 0.05, (1, H, W, 2)).astype(jnp.float32)

        @jax.jit
        def run(params, window, states):
            def step(st, _):
                out, new_st = engine.apply(params, None, window, st)
                return new_st, out["flow"][0].sum()
            final, fsum = jax.lax.scan(step, states, None, length=T)
            return fsum.sum(), final

        s, st = run(engine.params, window, est); float(s)
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter(); s, st = run(engine.params, window, st); float(s)
            best = min(best, time.perf_counter() - t0)
        print(f"deploy B=1 latency (mem={mem_dtype}): {best/T*1e3:.3f} ms/window "
              f"({T/best:.0f} win/s single-stream)", flush=True)
    finally:
        B = saved


def bench_resolution_scaling(mem_dtype="mixed", T=32, iters=3):
    """Serving latency across real event-camera resolutions (B=1):
    DVS128, DAVIS346, VGA Prophesee Gen3, HD Prophesee Gen4."""
    cfg = {
        "name": "LIFFireNet", "num_bins": 2, "base_num_channels": 32,
        "kernel_size": 3, "encoding": "cnt",
        "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
    }
    model = build_model(cfg)
    for name, (h, w) in [("DVS128 128x128", (128, 128)),
                         ("DAVIS346 260x346", (260, 346)),
                         ("MVSEC-crop 256x256", (256, 256)),
                         ("Gen3 VGA 480x640", (480, 640)),
                         ("Gen4 HD 720x1280", (720, 1280))]:
        key = jax.random.PRNGKey(0)
        states = model.init_states(1, h, w)
        variables = model.init(key, None, jnp.zeros((1, h, w, 2), jnp.float32), states)
        engine = Int8DeployEngine(model, variables, mem_dtype=mem_dtype)
        est = engine.init_states(1, h, w)
        window = jax.random.poisson(key, 0.05, (1, h, w, 2)).astype(jnp.float32)

        @jax.jit
        def run(params, window, states):
            def step(st, _):
                out, new_st = engine.apply(params, None, window, st)
                return new_st, out["flow"][0].sum()
            final, fsum = jax.lax.scan(step, states, None, length=T)
            return fsum.sum(), final

        s, st = run(engine.params, window, est); float(s)
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter(); s, st = run(engine.params, window, st); float(s)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:20s}: {best/T*1e3:.3f} ms/window ({T/best:.0f} win/s, "
              f"mem={mem_dtype})", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or ["bfloat16", "int8", "int8+z"]
    for md in args:
        if md == "latency":
            bench_latency()
        elif md == "scaling":
            bench_resolution_scaling()
        else:
            bench(md.replace("+z", ""), z_int8=md.endswith("+z"))
