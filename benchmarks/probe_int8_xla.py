"""Probe: XLA GEMM throughput at the im2col conv shapes, bf16 vs int8.

The headline path does [B*H*W, 288] @ [288, 32] per 3x3 conv (M huge,
K=288, N=32). v8 analysis: this runs at ~11 TFLOP/s bf16 on this chip.
Question: does an int8 x int8 -> int32 dot double it (and/or halve the
im2col materialization traffic)?
"""
import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, W = 8, 256, 256
M, K, N = B * H * W, 288, 32
L = 9      # dots per step (the 9 convs)
T = 8      # scan length

key = jax.random.PRNGKey(0)


def timeit(fn, *args):
    t0 = time.time()
    s = fn(*args); _ = float(s)
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); s = fn(*args); _ = float(s)
        best = min(best, time.perf_counter() - t0)
    return compile_s, best


flops = 2.0 * M * K * N * L * T

# --- bf16 chain: y_{l+1} derived from y_l to keep the loop dependent ---
xb = jax.random.normal(key, (M, K), jnp.bfloat16)
wsb = [jax.random.normal(jax.random.fold_in(key, i), (K, N), jnp.bfloat16) for i in range(L)]

@jax.jit
def run_bf16(x, ws):
    def step(c, _):
        acc = jnp.zeros((M, N), jnp.float32)
        for w in ws:
            acc += (c @ w).astype(jnp.float32)
        # fold result back into the carry so steps are dependent
        c = c + jnp.tile(acc.astype(jnp.bfloat16), (1, K // N)) * jnp.bfloat16(1e-6)
        return c, acc.sum()
    c, s = jax.lax.scan(step, x, None, length=T)
    return s.sum()

cs, t = timeit(run_bf16, xb, wsb)
print(f"bf16  [{M},{K}]@[{K},{N}] x{L} x{T}: compile {cs:.0f}s, {t*1e3:.1f} ms -> {flops/t/1e12:.1f} TFLOP/s", flush=True)

# --- int8 chain ---
xi = jax.random.randint(key, (M, K), -4, 5, jnp.int8)
wsi = [jax.random.randint(jax.random.fold_in(key, i), (K, N), -127, 128, jnp.int8) for i in range(L)]

@jax.jit
def run_int8(x, ws):
    def step(c, _):
        acc = jnp.zeros((M, N), jnp.int32)
        for w in ws:
            acc += jax.lax.dot_general(
                c, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
        c = c + jnp.tile((acc & 1).astype(jnp.int8), (1, K // N))
        return c, acc.sum()
    c, s = jax.lax.scan(step, x, None, length=T)
    return s.sum()

cs, t = timeit(run_int8, xi, wsi)
print(f"int8  [{M},{K}]@[{K},{N}] x{L} x{T}: compile {cs:.0f}s, {t*1e3:.1f} ms -> {flops/t/1e12:.1f} TOP/s", flush=True)

# --- int8 wide-N control: N=128 (full lanes) to see the lane ceiling ---
N2 = 128
wsw = [jax.random.randint(jax.random.fold_in(key, i), (K, N2), -127, 128, jnp.int8) for i in range(L)]

@jax.jit
def run_int8_wide(x, ws):
    def step(c, _):
        acc = jnp.zeros((M, N2), jnp.int32)
        for w in ws:
            acc += jax.lax.dot_general(
                c, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
        c = c + (acc[:, :K % N2 if K % N2 else N2].astype(jnp.int8) * 0 if False else 0)
        c = c + jnp.tile((acc[:, :N] & 1).astype(jnp.int8), (1, K // N))
        return c, acc.sum()
    c, s = jax.lax.scan(step, x, None, length=T)
    return s.sum()

cs, t = timeit(run_int8_wide, xi, wsw)
f2 = 2.0 * M * K * N2 * L * T
print(f"int8  [{M},{K}]@[{K},{N2}] x{L} x{T}: compile {cs:.0f}s, {t*1e3:.1f} ms -> {f2/t/1e12:.1f} TOP/s", flush=True)

# --- bf16 wide-N control ---
wsbw = [jax.random.normal(jax.random.fold_in(key, i), (K, N2), jnp.bfloat16) for i in range(L)]

@jax.jit
def run_bf16_wide(x, ws):
    def step(c, _):
        acc = jnp.zeros((M, N2), jnp.float32)
        for w in ws:
            acc += (c @ w).astype(jnp.float32)
        c = c + jnp.tile(acc[:, :N].astype(jnp.bfloat16), (1, K // N)) * jnp.bfloat16(1e-6)
        return c, acc.sum()
    c, s = jax.lax.scan(step, x, None, length=T)
    return s.sum()

cs, t = timeit(run_bf16_wide, xb, wsbw)
print(f"bf16  [{M},{K}]@[{K},{N2}] x{L} x{T}: compile {cs:.0f}s, {t*1e3:.1f} ms -> {f2/t/1e12:.1f} TFLOP/s", flush=True)
