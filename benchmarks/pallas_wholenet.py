import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from evflow.registry import build_model
from benchmarks.pallas_archive.fused_net import PallasFusedFireNet

B,H,W,T = 8,256,256,32
cfg = {"name":"LIFFireNet","num_bins":2,"base_num_channels":32,"kernel_size":3,
       "encoding":"cnt","spiking_neuron":{"leak":[0.0,1.0],"thresh":[0.0,0.8]}}
model = build_model(cfg)
states0 = model.init_states(B,H,W)
key = jax.random.PRNGKey(0)
variables = model.init(key, None, jnp.zeros((B,H,W,2)), states0)
pf = PallasFusedFireNet(model, variables, tile_rows=16)
window = jax.random.poisson(key, 0.05, (B,H,W,2)).astype(jnp.float32)

@jax.jit
def run(window, mems, spks):
    def step(carry, _):
        st = carry
        flow, st2 = pf.step(window, st)
        return st2, flow.sum()
    fin, s = jax.lax.scan(step, (mems, spks), None, length=T)
    return s.sum(), fin

mems, spks = pf.init_states(B,H,W)
try:
    t0=time.time(); s, st = run(window, mems, spks); _=float(s)
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    best=1e9
    for _ in range(4):
        t0=time.perf_counter(); s, st = run(window, *st); _=float(s)
        best=min(best, time.perf_counter()-t0)
    print(f"wholenet fused B={B} T={T}: {best*1e3:.1f} ms -> {T*B/best:.0f} win/s", flush=True)
except Exception as e:
    print("FAIL:", repr(e)[:300], flush=True)
