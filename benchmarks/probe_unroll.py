"""Probe round 3: unroll depth on the production (cols + dy) int8 schedule.

probe_phase2 settled the formulation: phase-slice loses once the scan is
unrolled (XLA's cross-window pipelining already hides the cols traffic it
removes), so the engine keeps cols+dy and gains from scan unrolling alone:
  unroll1 1652 | unroll2 1815 | unroll4 1887 (bf16 mems).

Here: unroll {4, 8} x {bf16, int8} membranes, plus the real mixed chain
(7 ff + 2 dual-rec) at the winning unroll — the exact engine configuration
bench.py runs (mem_dtype="mixed" ~ int8 mems on 8 of 9 units).

Run: python benchmarks/probe_unroll.py [u4i8 u8 u8i8 u16 c4 c8 c8i8]
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, W, C = 8, 256, 256, 32
L, T = 9, 16
REC = (1, 4)
key = jax.random.PRNGKey(0)


def timeit(fn, *args):
    t0 = time.time()
    out = fn(*args); _ = float(out[0])
    cs = time.time() - t0
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        out = fn(*args); _ = float(out[0])
        best = min(best, time.perf_counter() - t0)
    return cs, best


def report(name, cs, t):
    print(f"{name}: compile {cs:.0f}s, {t/T*1e3:.2f} ms/step -> {T*B/t:.0f} win/s-equiv", flush=True)


ks = [
    jax.random.normal(jax.random.fold_in(key, i), (3, 3, C, C), jnp.float32) * 0.05
    for i in range(L)
]
ws96 = [k.transpose(1, 2, 0, 3).reshape(3 * C, 3 * C) for k in ks]
wsi = [jnp.clip(jnp.round(w * 127 / jnp.max(jnp.abs(w))), -127, 127).astype(jnp.int8)
       for w in ws96]
scales = [jnp.bfloat16(float(jnp.max(jnp.abs(w))) / 127.0) for w in ws96]
krs = [
    jax.random.normal(jax.random.fold_in(key, 100 + i), (3, 3, C, C), jnp.float32) * 0.05
    for i in range(L)
]
wri = [jnp.clip(jnp.round(k.transpose(1, 2, 0, 3).reshape(3 * C, 3 * C) * 127
                          / jnp.max(jnp.abs(k))), -127, 127).astype(jnp.int8)
       for k in krs]

x0_i8 = (jax.random.uniform(key, (B, H, W, C), jnp.float32) < 0.15).astype(jnp.int8)
mems_bf = tuple(jnp.zeros((B, H, W, C), jnp.bfloat16) for _ in range(L))
mems_i8 = tuple(jnp.zeros((B, H, W, C), jnp.int8) for _ in range(L))
spk0 = tuple(jnp.zeros((B, H, W, C), jnp.int8) for _ in REC)
MEMS = jnp.bfloat16(0.05)


def dy_epi(Z):
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return (
        Zp[:, 0:H, :, 0:C]
        + Zp[:, 1 : 1 + H, :, C : 2 * C]
        + Zp[:, 2 : 2 + H, :, 2 * C : 3 * C]
    )


def cols(x):
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)


def conv(x_i8, w_i8, s):
    Z = jax.lax.dot_general(
        cols(x_i8).reshape(-1, 3 * C), w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * s
    return dy_epi(Z)


def conv_dual(x1, x2, w1, w2, s):
    c = jnp.concatenate([cols(x1), cols(x2)], axis=-1)
    w = jnp.concatenate([w1, w2], axis=0)
    Z = jax.lax.dot_general(
        c.reshape(-1, 6 * C), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * s
    return dy_epi(Z)


def make_run_ff(unroll, int8_mem=False):
    def run(x, mems):
        def step(carry, _):
            h, mems = carry
            new = []
            for i in range(L):
                y = conv(h, wsi[i], scales[i])
                if int8_mem:
                    m = mems[i].astype(jnp.bfloat16) * (MEMS * jnp.bfloat16(0.9)) + y
                else:
                    m = mems[i] * jnp.bfloat16(0.9) + y
                spk = m > jnp.bfloat16(1.0)
                h = spk.astype(jnp.int8)
                mo = jnp.where(spk, jnp.bfloat16(0), m)
                if int8_mem:
                    mo = jnp.clip(jnp.round(mo / MEMS), -127, 127).astype(jnp.int8)
                new.append(mo)
            return (h, tuple(new)), h.astype(jnp.int32).sum()
        (h, mems), s = jax.lax.scan(step, (x, mems), None, length=T, unroll=unroll)
        return s.sum(), h
    return run


def make_run_mixed(unroll, int8_mem=False):
    """7 ff + 2 dual-rec units; optionally int8 mems on every non-head unit
    (the engine's "mixed" tier)."""
    def run(x, mems, spks):
        def step(carry, _):
            h, mems, spks = carry
            new, new_s = [], []
            for i in range(L):
                if i in REC:
                    y = conv_dual(h, spks[REC.index(i)], wsi[i], wri[i], scales[i])
                else:
                    y = conv(h, wsi[i], scales[i])
                i8 = int8_mem and i != 0
                if i8:
                    m = mems[i].astype(jnp.bfloat16) * (MEMS * jnp.bfloat16(0.9)) + y
                else:
                    m = mems[i] * jnp.bfloat16(0.9) + y
                spk = m > jnp.bfloat16(1.0)
                h = spk.astype(jnp.int8)
                if i in REC:
                    new_s.append(h)
                mo = jnp.where(spk, jnp.bfloat16(0), m)
                if i8:
                    mo = jnp.clip(jnp.round(mo / MEMS), -127, 127).astype(jnp.int8)
                new.append(mo)
            return (h, tuple(new), tuple(new_s)), h.astype(jnp.int32).sum()
        (h, mems, spks), s = jax.lax.scan(
            step, (x, mems, spks), None, length=T, unroll=unroll)
        return s.sum(), h
    return run


if __name__ == "__main__":
    which = sys.argv[1:] or ["u4i8", "u8", "u8i8", "u16", "c4", "c8", "c8i8"]
    if "u4i8" in which:
        cs, t = timeit(jax.jit(make_run_ff(4, True)), x0_i8, mems_i8)
        report("u4i8 cols unroll4 i8-mem ", cs, t)
    if "u8" in which:
        cs, t = timeit(jax.jit(make_run_ff(8)), x0_i8, mems_bf)
        report("u8   cols unroll8 bf-mem ", cs, t)
    if "u8i8" in which:
        cs, t = timeit(jax.jit(make_run_ff(8, True)), x0_i8, mems_i8)
        report("u8i8 cols unroll8 i8-mem ", cs, t)
    if "u16" in which:
        cs, t = timeit(jax.jit(make_run_ff(16)), x0_i8, mems_bf)
        report("u16  cols unroll16 bf-mem", cs, t)
    if "c4" in which:
        m = tuple([mems_bf[0]] + list(mems_i8[1:]))
        cs, t = timeit(jax.jit(make_run_mixed(4, True)), x0_i8, m, spk0)
        report("c4   mixed-chain unroll4 ", cs, t)
    if "c8" in which:
        m = tuple([mems_bf[0]] + list(mems_i8[1:]))
        cs, t = timeit(jax.jit(make_run_mixed(8, True)), x0_i8, m, spk0)
        report("c8   mixed-chain unroll8 ", cs, t)
    if "c8i8" in which:
        cs, t = timeit(jax.jit(make_run_mixed(8, False)), x0_i8, mems_bf, spk0)
        report("c8bf mixed-chain u8 bf16 ", cs, t)
