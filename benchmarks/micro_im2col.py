import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

B,H,W,C,T = 8,256,256,32,64
key = jax.random.PRNGKey(0)

def timeit(fn, *args, iters=3, label=""):
    out = fn(*args); _=float(jax.tree.leaves(out)[0].sum())
    best=1e9
    for _ in range(iters):
        t0=time.perf_counter(); out = fn(*args); _=float(jax.tree.leaves(out)[0].sum())
        best=min(best, time.perf_counter()-t0)
    print(f"{label}: {best*1e3:.2f} ms -> {T*B/best:.0f} win/s", flush=True)
    return best

def im2col3x3(h):
    # h [B,H,W,C] -> [B,H,W,9C] via pad + 9 static slices
    hp = jnp.pad(h, ((0,0),(1,1),(1,1),(0,0)))
    cols = [hp[:, dy:dy+H, dx:dx+W, :] for dy in range(3) for dx in range(3)]
    return jnp.concatenate(cols, axis=-1)

ks = [jax.random.normal(jax.random.PRNGKey(i), (3,3,C,C), jnp.bfloat16) for i in range(9)]
wms = [k.reshape(9*C, C) for k in ks]
x = jax.random.normal(key, (B,H,W,C), jnp.bfloat16)
beta = jnp.float32(0.5); theta = jnp.float32(0.5)

@jax.jit
def matmul_cells(x, wms):
    def step(carry, _):
        mems = carry
        h = x
        new = []
        for w, mem in zip(wms, mems):
            p = im2col3x3(h)
            ff = (p.reshape(-1, 9*C) @ w).reshape(B,H,W,C).astype(jnp.float32)
            u = beta*mem + ff
            spk = (u > theta).astype(jnp.float32)
            new.append(u*(1-spk))
            h = spk.astype(jnp.bfloat16)
        return tuple(new), h.sum()
    mems0 = tuple(jnp.zeros((B,H,W,C), jnp.float32) for _ in range(9))
    final, s = jax.lax.scan(step, mems0, None, length=T)
    return s.sum()
t = timeit(matmul_cells, x, wms, label="9x (im2col-matmul conv + LIF) scan")
print(f"  -> {2*9*B*H*W*9*C*C*T/t/1e12:.1f} TFLOP/s", flush=True)

# also: keep LIF in bf16 entirely (mem bf16)
@jax.jit
def matmul_cells_bf16(x, wms):
    def step(carry, _):
        mems = carry
        h = x
        new = []
        for w, mem in zip(wms, mems):
            p = im2col3x3(h)
            ff = (p.reshape(-1, 9*C) @ w).reshape(B,H,W,C)
            u = jnp.bfloat16(0.5)*mem + ff
            spk = (u > jnp.bfloat16(0.5)).astype(jnp.bfloat16)
            new.append(u*(1-spk))
            h = spk
        return tuple(new), h.sum()
    mems0 = tuple(jnp.zeros((B,H,W,C), jnp.bfloat16) for _ in range(9))
    final, s = jax.lax.scan(step, mems0, None, length=T)
    return s.sum()
t = timeit(matmul_cells_bf16, x, wms, label="9x (im2col-matmul + LIF) all-bf16 scan")
