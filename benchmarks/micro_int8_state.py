import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

B,H,W,C,T = 8,256,256,32,64
key = jax.random.PRNGKey(0)

def im2col3x3(h):
    hp = jnp.pad(h, ((0,0),(1,1),(1,1),(0,0)))
    return jnp.concatenate([hp[:, dy:dy+H, dx:dx+W, :] for dy in range(3) for dx in range(3)], axis=-1)

ks = [jax.random.normal(jax.random.PRNGKey(i), (3,3,C,C), jnp.bfloat16) for i in range(9)]
wms = [k.reshape(9*C, C) for k in ks]
x = jax.random.normal(key, (B,H,W,C), jnp.bfloat16)
STEP = jnp.bfloat16(251.0/255.0)
LO = jnp.bfloat16(-250.0)

def timeit(fn, *args, label=""):
    out = fn(*args); _=float(jax.tree.leaves(out)[0].sum())
    best=1e9
    for _ in range(3):
        t0=time.perf_counter(); out = fn(*args); _=float(jax.tree.leaves(out)[0].sum())
        best=min(best, time.perf_counter()-t0)
    print(f"{label}: {best*1e3:.2f} ms -> {T*B/best:.0f} win/s", flush=True)

@jax.jit
def int8_cells(x, wms):
    def step(carry, _):
        mems = carry  # int8 tuple
        h = x
        new=[]
        for w, mq in zip(wms, mems):
            p = im2col3x3(h)
            ff = (p.reshape(-1, 9*C) @ w).reshape(B,H,W,C)
            mem = LO + (mq.astype(jnp.bfloat16) + 128) * STEP   # decode
            u = jnp.bfloat16(0.5)*mem + ff
            spk = (u > jnp.bfloat16(0.5)).astype(jnp.bfloat16)
            m2 = u*(1-spk)
            q = jnp.clip(jnp.round((m2 - LO)/STEP) - 128, -128, 127).astype(jnp.int8)  # encode
            new.append(q)
            h = spk
        return tuple(new), h.sum()
    mems0 = tuple(jnp.zeros((B,H,W,C), jnp.int8) for _ in range(9))
    _, s = jax.lax.scan(step, mems0, None, length=T)
    return s.sum()
timeit(int8_cells, x, wms, label="9x (im2col + LIF) int8 mem carries")
