import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

key = jax.random.PRNGKey(0)

# HBM bandwidth: sum of big array chain
N = 256 * 1024 * 1024 // 4  # 256MB f32
x = jax.random.normal(key, (N,), jnp.float32)
@jax.jit
def bw(x):
    def step(c, _):
        c = c * 1.000001 + 0.5
        return c, ()
    c, _ = jax.lax.scan(step, x, None, length=8)
    return c.sum()
t0=time.time(); _=float(bw(x)); print(f"bw compile {time.time()-t0:.0f}s", flush=True)
best=1e9
for _ in range(3):
    t0=time.perf_counter(); _=float(bw(x)); best=min(best, time.perf_counter()-t0)
gb = 8 * 2 * N * 4 / 1e9  # read+write per step
print(f"HBM BW: {gb/best:.0f} GB/s ({best*1e3:.1f} ms for {gb:.1f} GB)", flush=True)

# matmul peak with loop dependence: x = tanh-free chain x@w (keep norm stable by scaling)
M = K = Nn = 4096
a = jax.random.normal(key, (M, K), jnp.bfloat16) * 0.01
w = jax.random.normal(key, (K, Nn), jnp.bfloat16) * (1.0/K**0.5)
@jax.jit
def mm(a, w):
    def step(c, _):
        c = jnp.dot(c, w, preferred_element_type=jnp.bfloat16)
        return c, ()
    c, _ = jax.lax.scan(step, a, None, length=64)
    return c.sum()
t0=time.time(); _=float(mm(a, w)); print(f"mm compile {time.time()-t0:.0f}s", flush=True)
best=1e9
for _ in range(3):
    t0=time.perf_counter(); _=float(mm(a, w)); best=min(best, time.perf_counter()-t0)
fl = 2 * M * K * Nn * 64
print(f"matmul 4096^3 x64: {fl/best/1e12:.1f} TFLOP/s ({best*1e3:.1f} ms)", flush=True)

# matmul with K=288, N=32 (our conv shape), loop-dependent via slice+tile
M2 = 8*256*256 // 8  # 65536 rows
a2 = jax.random.normal(key, (M2, 288), jnp.bfloat16) * 0.01
w2 = jax.random.normal(key, (288, 32), jnp.bfloat16) * 0.05
@jax.jit
def mm2(a2, w2):
    def step(c, _):
        y = jnp.dot(c, w2, preferred_element_type=jnp.bfloat16)  # [M2, 32]
        c = jnp.tile(y, (1, 9))  # back to [M2, 288]
        return c, ()
    c, _ = jax.lax.scan(step, a2, None, length=64)
    return c.sum()
t0=time.time(); _=float(mm2(a2, w2)); print(f"mm2 compile {time.time()-t0:.0f}s", flush=True)
best=1e9
for _ in range(3):
    t0=time.perf_counter(); _=float(mm2(a2, w2)); best=min(best, time.perf_counter()-t0)
fl = 2 * M2 * 288 * 32 * 64
print(f"matmul [{M2},288]x[288,32] x64: {fl/best/1e12:.1f} TFLOP/s ({best*1e3:.1f} ms)", flush=True)
