import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from evflow.registry import build_model
from evflow.models.fused import FusedFireNet

B,H,W,T = 8,256,256,64
cfg = {"name":"LIFFireNet","num_bins":2,"base_num_channels":32,"kernel_size":3,
       "encoding":"cnt","spiking_neuron":{"leak":[0.0,1.0],"thresh":[0.0,0.8]}}
model = build_model(cfg)
states = model.init_states(B,H,W)
key = jax.random.PRNGKey(0)
variables = model.init(key, None, jnp.zeros((B,H,W,2)), states)
fused = FusedFireNet.from_firenet(model, variables, tile_rows=8)
fstates = fused.init_states(B,H,W)
window = jax.random.poisson(key, 0.05, (B,H,W,2)).astype(jnp.float32)

@jax.jit
def run(params, window, states):
    def body(st, _):
        flow, st2 = fused.step(params, window, st)
        return st2, flow.sum()
    final, s = jax.lax.scan(body, states, None, length=T)
    return s.sum(), final

t0=time.time(); s, st = run(fused.params, window, fstates); _=float(s)
print(f"compile {time.time()-t0:.0f}s", flush=True)
best=1e9
for _ in range(4):
    t0=time.perf_counter(); s, st = run(fused.params, window, st); _=float(s)
    best=min(best, time.perf_counter()-t0)
print(f"Pallas fused B={B} T={T}: {best*1e3:.1f} ms -> {T*B/best:.0f} win/s", flush=True)
for tr in (16, 32):
    fused2 = FusedFireNet.from_firenet(model, variables, tile_rows=tr)
    @jax.jit
    def run2(params, window, states):
        def body(st, _):
            flow, st2 = fused2.step(params, window, st)
            return st2, flow.sum()
        final, s = jax.lax.scan(body, states, None, length=T)
        return s.sum(), final
    try:
        s, st2_ = run2(fused2.params, window, fstates); _=float(s)
        best=1e9
        for _ in range(3):
            t0=time.perf_counter(); s, st2_ = run2(fused2.params, window, st2_); _=float(s)
            best=min(best, time.perf_counter()-t0)
        print(f"Pallas fused tile_rows={tr}: {best*1e3:.1f} ms -> {T*B/best:.0f} win/s", flush=True)
    except Exception as e:
        print("FAIL tile", tr, repr(e)[:200], flush=True)
