"""Real-model bench: LIFFireNet 256x256 with conv_impl variants."""
import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from evflow.registry import build_model

def bench(conv_impl, state_dtype="bfloat16", B=8, H=256, W=256, T=64, iters=4):
    cfg = {
        "name": "LIFFireNet", "num_bins": 2, "base_num_channels": 32,
        "kernel_size": 3, "encoding": "cnt",
        "compute_dtype": "bfloat16", "state_dtype": state_dtype,
        "conv_impl": conv_impl,
        "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
    }
    model = build_model(cfg)
    states = model.init_states(B, H, W)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, None, jnp.zeros((B, H, W, 2), jnp.float32), states)
    window = jax.random.poisson(key, 0.05, (B, H, W, 2)).astype(jnp.float32)

    def run(variables, window, states):
        def step(st, _):
            out, new_st = model.apply(variables, None, window, st, train=False)
            return new_st, out["flow"][0].sum()
        final, fsum = jax.lax.scan(step, states, None, length=T)
        return fsum.sum(), final

    run_j = jax.jit(run)
    t0 = time.time(); s, st = run_j(variables, window, states); float(s)
    cs = time.time() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter(); s, st = run_j(variables, window, st); float(s)
        best = min(best, time.perf_counter() - t0)
    print(f"{conv_impl:14s}: compile {cs:.0f}s, {T*B/best:.1f} win/s", flush=True)

bench("dypack")
bench("dypack_int8")
