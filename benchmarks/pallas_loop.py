import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from evflow.registry import build_model
from benchmarks.pallas_archive.fused_net_loop import LoopFusedFireNet

B,H,W,T = 8,256,256,32
cfg = {"name":"LIFFireNet","num_bins":2,"base_num_channels":32,"kernel_size":3,
       "encoding":"cnt","spiking_neuron":{"leak":[0.0,1.0],"thresh":[0.0,0.8]}}
model = build_model(cfg)
key = jax.random.PRNGKey(0)
variables = model.init(key, None, jnp.zeros((B,H,W,2)), model.init_states(B,H,W))
window = jax.random.poisson(key, 0.05, (B,H,W,2)).astype(jnp.float32)

for TR in (16, 32):
    lp = LoopFusedFireNet(model, variables, tile_rows=TR)
    @jax.jit
    def run(window, mems, spks):
        def step(carry, _):
            st = carry
            flow, st2 = lp.step(window, st)
            return st2, flow.sum()
        fin, s = jax.lax.scan(step, (mems, spks), None, length=T)
        return s.sum(), fin
    mems, spks = lp.init_states(B,H,W)
    try:
        t0=time.time(); s, st = run(window, mems, spks); _=float(s)
        print(f"TR={TR} compile {time.time()-t0:.0f}s", flush=True)
        best=1e9
        for _ in range(4):
            t0=time.perf_counter(); s, st = run(window, *st); _=float(s)
            best=min(best, time.perf_counter()-t0)
        print(f"loop fused TR={TR}: {best*1e3:.1f} ms -> {T*B/best:.0f} win/s", flush=True)
    except Exception as e:
        print(f"FAIL TR={TR}:", repr(e)[:200], flush=True)
