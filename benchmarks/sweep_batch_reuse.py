import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from evflow.registry import build_model

def measure(B, T, dtype, channels=32, H=256, W=256, iters=3):
    cfg = {"name":"LIFFireNet","num_bins":2,"base_num_channels":channels,"kernel_size":3,
           "encoding":"cnt","compute_dtype":dtype,
           "spiking_neuron":{"leak":[0.0,1.0],"thresh":[0.0,0.8]}}
    model = build_model(cfg)
    states = model.init_states(B,H,W)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, None, jnp.zeros((B,H,W,2)), states)
    window = jax.random.poisson(key, 0.05, (B,H,W,2)).astype(jnp.float32)
    def run(variables, window, states):
        def step(st, _):
            out, new_st = model.apply(variables, None, window, st, train=False)
            return new_st, out["flow"][0].sum()
        final, fsum = jax.lax.scan(step, states, None, length=T)
        return fsum.sum(), final
    run_j = jax.jit(run)
    t0=time.time(); s, st = run_j(variables, window, states); _=float(s)
    compile_t = time.time()-t0
    best = 1e9
    for _ in range(iters):
        t0=time.perf_counter(); s, st = run_j(variables, window, st); _=float(s)
        best = min(best, time.perf_counter()-t0)
    print(f"B={B} T={T} ch={channels} {dtype or 'f32'}: compile {compile_t:.0f}s, {T*B/best:.0f} win/s ({best*1e3:.1f} ms)", flush=True)

for args in [(8,64,"bfloat16"), (32,64,"bfloat16"), (128,32,"bfloat16"), (32,64,None)]:
    try:
        measure(*args)
    except Exception as e:
        print("FAIL", args, repr(e), flush=True)
