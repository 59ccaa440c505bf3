"""Probe: int4 cols for the dual GEMM — conversion INSIDE jit (round 5).

History: benchmarks/probe_int4.py (round 4) cast concrete arrays with
``astype(int4)`` OUTSIDE jit and hit a trace-time RecursionError on the
then-installed jax; the round-4 verdict flagged that the in-graph
``lax.convert_element_type`` path was never tried. On jax 0.9.0 the
concrete cast works and mixed s4 x s8 dots trace fine on CPU (the CPU
backend rejects s4 x s4 at the HLO verifier — backend, not trace, level).
This probe measures the TPU backend.

Why int4 could matter: in the deploy engine every unit EXCEPT the head
consumes binary {0,1} spikes (deploy.py step: ``h = spk.astype(int8)``),
so the entire cols buffer of 6 of 7 FireNet units — including both halves
of the dual units' [BHW, 192] buffers, the step's dominant HBM stream
(ROOFLINE §1: 50 MB of operands at the ~1 TB/s ceiling) — is int4-exact.
If s4 cols + s4 x s8 dots run at s8 speed or better, the A-stream halves
with zero accuracy cost.

Stage 1 (micro): [131072, 192] @ [192, 96] GEMM chain in a scan with a
loop-carried dependency (new binary cols derived from Z each step so
nothing hoists):
  m0: s8 cols carry, s8 x s8 dot            (control — shipped form)
  m1: s8 cols carry, in-jit convert -> s4, s4 x s8 dot
  m2: s4 cols carry (int4 in the scan carry), s4 x s8 dot
  m3: s4 cols carry, s4 x s4 dot (weights clipped to [-7,7]; perf only)

Run: python benchmarks/probe_int4_injit.py [m0 m1 m2 m3]
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M, K, N = 2 * 256 * 256, 192, 96
T = 512
key = jax.random.PRNGKey(0)

cols0_i8 = (jax.random.uniform(key, (M, K)) < 0.15).astype(jnp.int8)
w8 = jnp.clip(
    jnp.round(jax.random.normal(jax.random.fold_in(key, 1), (K, N)) * 25.0),
    -127, 127,
).astype(jnp.int8)
w4 = jnp.clip(jnp.round(w8 / 18.0), -7, 7)  # perf-only narrow weights


def _dot(a, w):
    return lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)


def _feedback(Zi, dtype):
    """New binary cols from Z: keeps the scan loop-carried (nothing hoists)."""
    pos = (Zi > 0)
    return jnp.concatenate([pos, ~pos], axis=1).astype(dtype)


def make_run(carry_dtype, a_dtype, w, convert_inside=False):
    """``convert_inside``: jit takes s8 and converts the scan-carry init to
    ``carry_dtype`` in-graph — int4 arrays cannot cross the jit boundary on
    this toolchain (RecursionError on the S4 arg signature, variant m2)."""
    wd = w.astype(a_dtype) if a_dtype == jnp.int4 and w is w4 else w

    def step(carry, _):
        cols = carry
        a = lax.convert_element_type(cols, a_dtype)
        Zi = _dot(a, wd)
        return _feedback(Zi, carry_dtype), ()

    @jax.jit
    def run(cols):
        init = lax.convert_element_type(cols, carry_dtype)
        out, _ = lax.scan(step, init, None, length=T)
        return out.astype(jnp.int32).sum()

    if convert_inside:
        return run, cols0_i8
    return run, lax.convert_element_type(cols0_i8, carry_dtype)


VARIANTS = {
    # name: (carry dtype, dot A dtype, weights, convert_inside)
    "m0": (jnp.int8, jnp.int8, w8, False),
    "m1": (jnp.int8, jnp.int4, w8, False),
    "m2": (jnp.int4, jnp.int4, w8, False),   # S4 jit arg: RecursionError
    "m2b": (jnp.int4, jnp.int4, w8, True),   # s4 carry, init converted in-graph
    "m3": (jnp.int4, jnp.int4, w4, False),   # s4 x s4 dot: UNIMPLEMENTED
}


def timeit(run, init):
    t0 = time.time()
    _ = int(run(init))
    cs = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = int(run(init))
        best = min(best, time.perf_counter() - t0)
    return cs, best


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        carry_dt, a_dt, w, inside = VARIANTS[name]
        try:
            run, init = make_run(carry_dt, a_dt, w, convert_inside=inside)
            cs, t = timeit(run, init)
            us = t / T * 1e6
            tops = 2 * M * K * N / (t / T) / 1e12
            print(f"{name}: compile {cs:.0f}s  {us:.1f} us/step  {tops:.1f} TOP/s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
