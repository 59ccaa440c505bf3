import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

B,H,W,C,T = 8,256,256,32,64
key = jax.random.PRNGKey(0)

def timeit(fn, *args, iters=3, label=""):
    out = fn(*args); jax.tree.leaves(out)[0].block_until_ready
    s = jax.tree.leaves(out)[0].sum(); _=float(s)
    best=1e9
    for _ in range(iters):
        t0=time.perf_counter(); out = fn(*args); _=float(jax.tree.leaves(out)[0].sum())
        best=min(best, time.perf_counter()-t0)
    print(f"{label}: {best*1e3:.2f} ms", flush=True)
    return best

# 1) pure matmul equivalent of one conv layer: [B*H*W, 9C] @ [9C, C], x9 layers, xT steps
M = B*H*W
a = jax.random.normal(key, (M, 9*C), jnp.bfloat16)
w = jax.random.normal(key, (9*C, C), jnp.bfloat16)
@jax.jit
def mm(a, w):
    def step(carry, _):
        y = a @ w
        return carry, y.sum()
    _, s = jax.lax.scan(step, 0., None, length=T*9)
    return s.sum()
t = timeit(mm, a, w, label=f"matmul [{M},{9*C}]x[{9*C},{C}] x{T*9}")
flops = 2*M*9*C*C*T*9
print(f"  -> {flops/t/1e12:.1f} TFLOP/s", flush=True)

# 2) chain of 9 convs (bf16), scanned T times
x = jax.random.normal(key, (B,H,W,C), jnp.bfloat16)
ks = [jax.random.normal(jax.random.PRNGKey(i), (3,3,C,C), jnp.bfloat16) for i in range(9)]
@jax.jit
def convs(x, ks):
    def step(carry, _):
        h = carry
        for k in ks:
            h = jax.lax.conv_general_dilated(h, k, (1,1), "SAME",
                dimension_numbers=("NHWC","HWIO","NHWC"),
                preferred_element_type=jnp.bfloat16)
        return h, h.sum()
    final, s = jax.lax.scan(step, x, None, length=T)
    return s.sum()
t = timeit(convs, x, ks, label=f"9x conv3x3 {C}ch scan x{T}")
flops = 2*9*9*C*C*H*W*B*T
print(f"  -> {flops/t/1e12:.1f} TFLOP/s -> {T*B/t:.0f} win/s-equivalent", flush=True)

# 3) conv + BN-ish + LIF elementwise chain (full cell math, no flax)
beta = jnp.ones((C,), jnp.float32)*0.5
theta = jnp.ones((C,), jnp.float32)*0.5
@jax.jit
def cells(x, ks):
    def step(carry, _):
        mems = carry
        h = x
        new = []
        for k, mem in zip(ks, mems):
            ff = jax.lax.conv_general_dilated(h, k, (1,1), "SAME",
                dimension_numbers=("NHWC","HWIO","NHWC"),
                preferred_element_type=jnp.float32)
            u = beta*mem + ff
            spk = (u > theta).astype(jnp.float32)
            mem2 = u*(1-spk)
            new.append(mem2)
            h = spk.astype(jnp.bfloat16)
        return tuple(new), h.sum()
    mems0 = tuple(jnp.zeros((B,H,W,C), jnp.float32) for _ in range(9))
    final, s = jax.lax.scan(step, mems0, None, length=T)
    return s.sum()
t = timeit(cells, x, ks, label=f"9x (conv+LIF) scan x{T}")
print(f"  -> {T*B/t:.0f} win/s-equivalent", flush=True)
