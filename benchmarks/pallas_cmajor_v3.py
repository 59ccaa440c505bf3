import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from evflow.ops.pallas.conv_lif_cmajor import fused_conv_lif_cmajor

B,H,W,C,T = 8,256,256,32,32
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B,C,H,W), jnp.float32)
ws = [jax.random.normal(jax.random.PRNGKey(i), (3,3,C,C), jnp.float32)*0.1 for i in range(9)]
bias = jnp.zeros((C,)); beta = jnp.full((C,),0.5); theta = jnp.full((C,),0.5)

for TR in (16, 32):
    @jax.jit
    def run(x, ws, mems):
        def step(carry, _):
            mems = carry
            h = x
            new=[]
            for w, mem in zip(ws, mems):
                spk, mem2 = fused_conv_lif_cmajor(h, mem, w, bias, beta, theta, tile_rows=TR)
                new.append(mem2); h = spk
            return tuple(new), h.sum()
        _, s = jax.lax.scan(step, mems, None, length=T)
        return s.sum()
    mems0 = tuple(jnp.zeros((B,C,H,W), jnp.float32) for _ in range(9))
    try:
        t0=time.time(); s = run(x, ws, mems0); _=float(s)
        print(f"TR={TR} compile {time.time()-t0:.0f}s", flush=True)
        best=1e9
        for _ in range(3):
            t0=time.perf_counter(); s = run(x, ws, mems0); _=float(s)
            best=min(best, time.perf_counter()-t0)
        print(f"cmajor-v3 TR={TR}: {best*1e3:.1f} ms -> {T*B/best:.0f} win/s", flush=True)
    except Exception as e:
        print("FAIL TR", TR, repr(e)[:160], flush=True)
