"""Probe: dual-unit (K=6C) int8 GEMM emitter-shape sweep.

ROOFLINE §1 (bf16/B=2 shipped-schedule trace): the TWO dual units' GEMMs
run 51 us each vs 10.5 us per ff unit — 4.8x the time for 2x the FLOPs.
The K=192 s8 conv emitter at N=96 is ~2.4x less FLOP-efficient than the
K=96 one. The round-3 verdict names the unmeasured cells: N padding
96->128, K padding to a friendlier multiple, emitter-shape variants at
K=192. This probe measures them on a dual-unit chain harness in the
shipped regime (B=2, long scan, int8 cols, bf16 Z, bf16 membranes).

Chain: L recurrent (dual) units, each cols_dx_dual(h, prev_spk) ->
s8 GEMM [BHW, 6C] @ [6C, 3C] -> bf16*scale -> dy epilogue -> leaky LIF,
spike feeds the next unit AND the unit's own next-step recurrent cols
(carry-dependent: nothing hoists, per the round-8 probe-methodology note).
Plus an ff-only chain (K=3C) for the in-harness efficiency ratio.

Variants (only the GEMM formulation changes):
  ff   : ff-only chain, K=96 GEMMs (calibrates the per-unit ratio)
  v0   : control — shipped dual form, [BHW,192] @ [192,96]
  v1   : N-pad 96->128 (w zero-padded; Z sliced back before the epilogue)
  v2   : K-pad 192->256 (cols+w zero-padded)
  v3   : N+K pad ([BHW,256] @ [256,128])
  v4   : transposed rhs ([96,192] stored, contracting dim 1)
  v5   : explicit 1x1 conv emitter (lax.conv NHWC s8xs8->s32)

Chain numbers rank formulations; only a full-engine bench decides
(rounds 4-7 rule). Run: python benchmarks/probe_dual_gemm.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, W, C = 2, 256, 256, 32
L, T = 4, 1024
K6, N3 = 6 * C, 3 * C
key = jax.random.PRNGKey(0)

from evflow.ops.dypack import cols_dx, cols_dx_dual, dy_epilogue
from evflow.ops.lif import leaky_step

# per-unit int8 weights: dual [6C, 3C], ff [3C, 3C]
ws_dual, ws_ff, scales = [], [], []
for i in range(L):
    w = jax.random.normal(jax.random.fold_in(key, i), (K6, N3), jnp.float32) * 0.05
    s = float(jnp.max(jnp.abs(w))) / 127.0
    ws_dual.append(jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8))
    ws_ff.append(ws_dual[-1][:3 * C])
    scales.append(jnp.bfloat16(s))
beta = jnp.full((C,), 0.9, jnp.float32)
theta = jnp.full((C,), 0.25, jnp.float32)

x0 = (jax.random.uniform(key, (B, H, W, C), jnp.float32) < 0.15).astype(jnp.int8)
mems0 = tuple(jnp.zeros((B, H, W, C), jnp.bfloat16) for _ in range(L))
spks0 = tuple(jnp.zeros((B, H, W, C), jnp.int8) for _ in range(L))


def gemm_v0(cols, w, s):
    Zi = jax.lax.dot_general(cols.reshape(-1, cols.shape[-1]), w,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    return (Zi.astype(jnp.bfloat16) * s).reshape(B, H, W, N3)


def gemm_v1(cols, w, s):  # N-pad 96 -> 128
    wp = jnp.pad(w, ((0, 0), (0, 128 - N3)))
    Zi = jax.lax.dot_general(cols.reshape(-1, cols.shape[-1]), wp,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    return (Zi[:, :N3].astype(jnp.bfloat16) * s).reshape(B, H, W, N3)


def gemm_v2(cols, w, s):  # K-pad 192 -> 256
    K = cols.shape[-1]
    colsp = jnp.pad(cols, ((0, 0), (0, 0), (0, 0), (0, 256 - K)))
    wp = jnp.pad(w, ((0, 256 - K), (0, 0)))
    Zi = jax.lax.dot_general(colsp.reshape(-1, 256), wp,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    return (Zi.astype(jnp.bfloat16) * s).reshape(B, H, W, N3)


def gemm_v3(cols, w, s):  # N+K pad
    K = cols.shape[-1]
    colsp = jnp.pad(cols, ((0, 0), (0, 0), (0, 0), (0, 256 - K)))
    wp = jnp.pad(w, ((0, 256 - K), (0, 128 - N3)))
    Zi = jax.lax.dot_general(colsp.reshape(-1, 256), wp,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    return (Zi[:, :N3].astype(jnp.bfloat16) * s).reshape(B, H, W, N3)


def gemm_v4(cols, w, s):  # transposed rhs
    wt = w.T  # [N3, K] — materialized once per scan, hoisted (loop-invariant)
    Zi = jax.lax.dot_general(cols.reshape(-1, cols.shape[-1]), wt,
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    return (Zi.astype(jnp.bfloat16) * s).reshape(B, H, W, N3)


def gemm_v5(cols, w, s):  # explicit 1x1 conv
    Zi = jax.lax.conv_general_dilated(
        cols, w.reshape(1, 1, cols.shape[-1], N3),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return Zi.astype(jnp.bfloat16) * s


VARIANTS = {"v0": gemm_v0, "v1": gemm_v1, "v2": gemm_v2, "v3": gemm_v3,
            "v4": gemm_v4, "v5": gemm_v5}


def make_step(gemm, dual):
    def step(carry, _):
        h, mems, spks = carry
        new_m, new_s = [], []
        for i in range(L):
            if dual:
                cols = cols_dx_dual(h, spks[i])
                y = dy_epilogue(gemm(cols, ws_dual[i], scales[i]), H, C)
            else:
                cols = cols_dx(h)
                y = dy_epilogue(gemm(cols, ws_ff[i], scales[i]), H, C)
            spk, mem = leaky_step(y, mems[i].astype(jnp.float32),
                                  beta, theta, reset="zero")
            h = spk.astype(jnp.int8)
            new_m.append(mem.astype(jnp.bfloat16))
            new_s.append(h)
        return (h, tuple(new_m), tuple(new_s)), ()

    @jax.jit
    def run(x, mems, spks):
        (h, m, s), _ = jax.lax.scan(step, (x, mems, spks), None, length=T)
        return h.astype(jnp.float32).sum(), m

    return run


def timeit(fn):
    t0 = time.time()
    out = fn(x0, mems0, spks0); _ = float(out[0])
    cs = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(x0, mems0, spks0); _ = float(out[0])
        best = min(best, time.perf_counter() - t0)
    return cs, best


if __name__ == "__main__":
    names = sys.argv[1:] or ["ff"] + list(VARIANTS)
    for name in names:
        if name == "ff":
            run = make_step(gemm_v0, dual=False)
        else:
            run = make_step(VARIANTS[name], dual=True)
        cs, t = timeit(run)
        per_unit_us = t / T / L * 1e6
        print(f"{name}: compile {cs:.0f}s  {t / T * 1e3:.3f} ms/step  "
              f"{per_unit_us:.1f} us/unit  {T * B / t:.0f} win/s-equiv",
              flush=True)
