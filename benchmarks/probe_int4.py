"""Probe: is the int4 MXU path real on this chip/toolchain?

Spikes are {0,1} so int4 cols are exact; if int4 x int4 -> int32 dots run
at 2x int8 (and halve the A-operand stream), W4A4 becomes a serving tier
(int4 weights cost accuracy — separate question). Also probes mixed
int4 x int8 (exact weights) which XLA may or may not accept.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M, K, N = 524288, 96, 96
key = jax.random.PRNGKey(0)
a8 = (jax.random.uniform(key, (M, K)) < 0.2).astype(jnp.int8)
w8 = jnp.clip(jax.random.randint(key, (K, N), -127, 127), -127, 127).astype(jnp.int8)


def timeit(fn, *args, iters=3):
    out = fn(*args); _ = int(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args); _ = int(out)
        best = min(best, time.perf_counter() - t0)
    return best


def dot(a, w):
    return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32).sum()


t = timeit(jax.jit(dot), a8, w8)
print(f"int8 x int8 [{M},{K}]@[{K},{N}] : {t*1e3:.2f} ms ({2*M*K*N/t/1e12:.1f} TOP/s)", flush=True)

try:
    a4 = a8.astype(jnp.int4)
    w4 = jnp.clip(w8, -7, 7).astype(jnp.int4)
    t = timeit(jax.jit(dot), a4, w4)
    print(f"int4 x int4                  : {t*1e3:.2f} ms ({2*M*K*N/t/1e12:.1f} TOP/s)", flush=True)
except Exception as e:
    print(f"int4 x int4: FAILED ({type(e).__name__}: {str(e)[:160]})", flush=True)

try:
    a4 = a8.astype(jnp.int4)
    t = timeit(jax.jit(dot), a4, w8)
    print(f"int4 x int8 (mixed)          : {t*1e3:.2f} ms ({2*M*K*N/t/1e12:.1f} TOP/s)", flush=True)
except Exception as e:
    print(f"int4 x int8: FAILED ({type(e).__name__}: {str(e)[:160]})", flush=True)
