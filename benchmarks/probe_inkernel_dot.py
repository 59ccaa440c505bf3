"""Probe: in-kernel MXU dot efficiency with STATIC weights, both orientations.

v8 measured 2.4 TFLOP/s for in-kernel [32,96]@[96,6144] dots with dynamically
indexed weights. Question: with static VMEM-resident weights, K=288, and a
large pixel dim, what do kernels actually reach for

  A  pixel-major   [Np, 288] @ [288, 32]   (the XLA im2col orientation)
  B  channel-major [32, 288] @ [288, Np]
  Bi same as B, int8 x int8 -> int32 (does Mosaic lower it, how fast)
  C  v8 control    [32, 96] @ [96, Np] x3 chained (static weights)

All operands live in VMEM; the grid re-runs the dots S times with a carried
dependency so nothing is optimized away. FLOPs = 2*M*K*N * L * S.
"""
import sys; sys.path.insert(0, "/root/repo")
import functools
import time
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

Np = 8192      # pixel-tile size (e.g. 32 rows x 256 cols)
C = 32
K = 288
L = 9          # dots per grid step (the 9 convs of a window)
S = 64         # grid steps

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


def report(name, M, Kd, N, cs, t, l=L):
    fl = 2.0 * M * Kd * N * l * S
    print(f"{name}: compile {cs:.0f}s, {t*1e3:.2f} ms -> {fl/t/1e12:.1f} T/s", flush=True)


# ---------- A: pixel-major ----------
def kern_a(x_ref, w_ref, o_ref):
    acc = jnp.zeros((Np, C), jnp.float32)
    x = x_ref[:]
    for i in range(L):
        w = w_ref[i]
        acc += jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[:] += acc


@jax.jit
def run_a(x, w):
    return pl.pallas_call(
        kern_a,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((Np, K), lambda i: (0, 0)),
            pl.BlockSpec((L, K, C), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Np, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, C), jnp.float32),
    )(x, w)


xa = jax.random.normal(key, (Np, K), jnp.bfloat16)
wa = jax.random.normal(key, (L, K, C), jnp.bfloat16)
cs, t = timeit(run_a, xa, wa)
report(f"A  pixel-major   [{Np},{K}]@[{K},{C}]", Np, K, C, cs, t)


# ---------- B: channel-major ----------
def kern_b(x_ref, w_ref, o_ref):
    acc = jnp.zeros((C, Np), jnp.float32)
    x = x_ref[:]
    for i in range(L):
        w = w_ref[i]
        acc += jax.lax.dot_general(
            w, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[:] += acc


@jax.jit
def run_b(x, w):
    return pl.pallas_call(
        kern_b,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((K, Np), lambda i: (0, 0)),
            pl.BlockSpec((L, C, K), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((C, Np), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, Np), jnp.float32),
    )(x, w)


xb = jax.random.normal(key, (K, Np), jnp.bfloat16)
wb = jax.random.normal(key, (L, C, K), jnp.bfloat16)
cs, t = timeit(run_b, xb, wb)
report(f"B  channel-major [{C},{K}]@[{K},{Np}]", C, K, Np, cs, t)


# ---------- Bi: channel-major int8 ----------
def kern_bi(x_ref, w_ref, o_ref):
    acc = jnp.zeros((C, Np), jnp.int32)
    x = x_ref[:]
    for i in range(L):
        w = w_ref[i]
        acc += jax.lax.dot_general(
            w, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[:] += acc


@jax.jit
def run_bi(x, w):
    return pl.pallas_call(
        kern_bi,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((K, Np), lambda i: (0, 0)),
            pl.BlockSpec((L, C, K), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((C, Np), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, Np), jnp.int32),
    )(x, w)


xi = jax.random.randint(key, (K, Np), -4, 5, jnp.int8)
wi = jax.random.randint(key, (L, C, K), -127, 128, jnp.int8)
try:
    cs, t = timeit(run_bi, xi, wi)
    report(f"Bi channel-major int8 [{C},{K}]@[{K},{Np}]", C, K, Np, cs, t)
except Exception as e:
    print(f"Bi int8 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


# ---------- C: v8 control, K=96 chained x3 ----------
def kern_c(x_ref, w_ref, o_ref):
    acc = jnp.zeros((C, Np), jnp.float32)
    for i in range(L):
        for j in range(3):
            x = x_ref[j]
            w = w_ref[i, j]
            acc += jax.lax.dot_general(
                w, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[:] += acc


@jax.jit
def run_c(x, w):
    return pl.pallas_call(
        kern_c,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((3, 96, Np), lambda i: (0, 0, 0)),
            pl.BlockSpec((L, 3, C, 96), lambda i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((C, Np), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, Np), jnp.float32),
    )(x, w)


xc = jax.random.normal(key, (3, 96, Np), jnp.bfloat16)
wc = jax.random.normal(key, (L, 3, C, 96), jnp.bfloat16)
cs, t = timeit(run_c, xc, wc)
report(f"C  K-split x3    [{C},96]@[96,{Np}]", C, 96 * 3, Np, cs, t)
