import sys; sys.path.insert(0, "/root/repo")
from bench import bench
import bench as B
# monkeypatch config through bench's cfg: easiest is to re-implement inline
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from evflow.registry import build_model

def run_variant(conv_impl):
    Bn,H,W,T = 8,256,256,64
    cfg = {"name":"LIFFireNet","num_bins":2,"base_num_channels":32,"kernel_size":3,
           "encoding":"cnt","compute_dtype":"bfloat16","state_dtype":"bfloat16",
           "conv_impl":conv_impl,
           "spiking_neuron":{"leak":[0.0,1.0],"thresh":[0.0,0.8]}}
    model = build_model(cfg)
    states = model.init_states(Bn,H,W)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, None, jnp.zeros((Bn,H,W,2)), states)
    window = jax.random.poisson(key, 0.05, (Bn,H,W,2)).astype(jnp.float32)
    @jax.jit
    def run(variables, window, states):
        def step(st, _):
            out, new_st = model.apply(variables, None, window, st, train=False)
            return new_st, out["flow"][0].sum()
        final, fsum = jax.lax.scan(step, states, None, length=T)
        return fsum.sum(), final
    s, st = run(variables, window, states); _=float(s)
    best=1e9
    for _ in range(3):
        t0=time.perf_counter(); s, st = run(variables, window, st); _=float(s)
        best=min(best, time.perf_counter()-t0)
    print(f"conv_impl={conv_impl}: {T*Bn/best:.0f} win/s", flush=True)

run_variant("lax")
