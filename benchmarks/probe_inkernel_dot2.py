"""Probe 2b: why are in-kernel dots 3x slower than XLA's at C=32 shapes?

Variants on channel-major [32,288]@[288,8192] (probe_inkernel_dot.py B = 3.2
TF/s): bf16 accumulate, larger M, larger Np, single giant dot per step, and
explicit K-padding to 384.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

S = 64
key = jax.random.PRNGKey(0)


def timeit(fn, *args):
    t0 = time.time()
    out = fn(*args); _ = float(out.sum())
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); out = fn(*args); _ = float(out.sum())
        best = min(best, time.perf_counter() - t0)
    return compile_s, best


def make(M, K, Np, L, acc_dtype, out_dtype=jnp.float32):
    def kern(x_ref, w_ref, o_ref):
        acc = jnp.zeros((M, Np), acc_dtype)
        x = x_ref[:]
        for i in range(L):
            w = w_ref[i]
            acc += jax.lax.dot_general(
                w, x, (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype
            )
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += acc.astype(out_dtype)

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kern,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((K, Np), lambda i: (0, 0)),
                pl.BlockSpec((L, M, K), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((M, Np), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((M, Np), out_dtype),
        )(x, w)

    return run


def bench(name, M, K, Np, L, acc_dtype):
    x = jax.random.normal(key, (K, Np), jnp.bfloat16)
    w = jax.random.normal(key, (L, M, K), jnp.bfloat16)
    run = make(M, K, Np, L, acc_dtype)
    try:
        cs, t = timeit(run, x, w)
        fl = 2.0 * M * K * Np * L * S
        print(f"{name}: compile {cs:.0f}s, {t*1e3:.2f} ms -> {fl/t/1e12:.1f} TF/s", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


bench("acc=bf16 [32,288]@[288,8192] x9", 32, 288, 8192, 9, jnp.bfloat16)
bench("acc=f32  [128,288]@[288,8192] x9", 128, 288, 8192, 9, jnp.float32)
bench("acc=f32  [32,384]@[384,8192] x9 (K pad 3x128)", 32, 384, 8192, 9, jnp.float32)
bench("acc=f32  [32,288]@[288,32768] x9", 32, 288, 32768, 9, jnp.float32)
bench("acc=f32  [32,288]@[288,8192] x1", 32, 288, 8192, 1, jnp.float32)
bench("acc=f32  [256,256]@[256,8192] x9", 256, 256, 8192, 9, jnp.float32)
