"""Probe round 2: combine the two probe_dy9pack winners and extend to the
engine's real configuration.

probe_dy9pack measured (9-conv chain, int8 spikes, bf16 mems):
  v1 baseline 1652 | v5 phase-slice no-cols 1740 | v7 unroll=2 1815
  (v6 full 9-pack 754 — dead, as HBM accounting predicted)

Here:
  a1  v1 + unroll4         : deeper cross-window pipelining
  a2  v5 + unroll2         : both winners combined
  a3  v5 + unroll4
  a4  v5 + unroll8
  b1  a-best + int8 mems   : the engine's fast tier (cmp. v2 1860 baseline)
  c1  dual-unit phase-slice: recurrent units take TWO inputs (ff + rec);
      phase-slice computes Z = lhs_h @ W_top + lhs_s @ W_bot as two dots on
      zero-copy slices (no 6C cols concat). Chain = 7 ff + 2 dual, the real
      LIFFireNet layout.
  c2  same chain with the current engine schedule (cols concat) + unroll
      — the apples-to-apples baseline for the engine decision.

Run: python benchmarks/probe_phase2.py [a1 a2 a3 a4 b1 c1 c2 check]
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
Wo = 3 * ((W + 2) // 3)
REC = (1, 4)  # which chain indices are "recurrent" (ff+rec dual), ~G1/G2
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
# extra "rec" kernels for the dual chain
krs = [
    jax.random.normal(jax.random.fold_in(key, 100 + i), (3, 3, C, C), jnp.float32) * 0.05
    for i in range(L)
]
wr96 = [k.transpose(1, 2, 0, 3).reshape(3 * C, 3 * C) for k in krs]
wri = [jnp.clip(jnp.round(w * 127 / jnp.max(jnp.abs(w))), -127, 127).astype(jnp.int8)
       for w in wr96]

x0_i8 = (jax.random.uniform(key, (B, H, W, C), jnp.float32) < 0.15).astype(jnp.int8)
mems_bf = tuple(jnp.zeros((B, H, W, C), jnp.bfloat16) for _ in range(L))
mems_i8 = tuple(jnp.zeros((B, H, W, C), jnp.int8) for _ in range(L))
spk0 = tuple(jnp.zeros((B, H, W, C), jnp.int8) for _ in REC)
MEMS = jnp.bfloat16(0.05)


def dy_epi(Z, Hh=H):
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return (
        Zp[:, 0:Hh, :, 0:C]
        + Zp[:, 1 : 1 + Hh, :, C : 2 * C]
        + Zp[:, 2 : 2 + Hh, :, 2 * C : 3 * C]
    )


def conv_cols(x_i8, w_i8, s):
    xp = jnp.pad(x_i8, ((0, 0), (0, 0), (1, 1), (0, 0)))
    cols = jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)
    Z = jax.lax.dot_general(
        cols.reshape(-1, 3 * C), w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * s
    return dy_epi(Z)


def conv_cols_dual(x1, x2, w1, w2, s):
    def cols(x):
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        return jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)
    c = jnp.concatenate([cols(x1), cols(x2)], axis=-1)
    w = jnp.concatenate([w1, w2], axis=0)
    Z = jax.lax.dot_general(
        c.reshape(-1, 6 * C), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * s
    return dy_epi(Z)


def _phase_lhs(x_i8):
    xp = jnp.pad(x_i8, ((0, 0), (0, 0), (1, Wo + 1 - W), (0, 0)))
    xf = xp.reshape(B, H, (Wo + 2) * C)
    return [
        jax.lax.slice_in_dim(xf, r * C, r * C + Wo * C, axis=2)
        .reshape(B * H * (Wo // 3), 3 * C)
        for r in range(3)
    ]


def _phase_merge(zs, s):
    """Per-phase int32 Z -> dy epilogue -> interleave x phases, trim."""
    ys = []
    for Zi in zs:
        Z = Zi.astype(jnp.bfloat16).reshape(B, H, Wo // 3, 3 * C) * s
        ys.append(dy_epi(Z))
    y = jnp.stack(ys, axis=3).reshape(B, H, Wo, C)
    return y[:, :, :W, :]


def conv_phase(x_i8, w_i8, s):
    zs = [
        jax.lax.dot_general(l, w_i8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        for l in _phase_lhs(x_i8)
    ]
    return _phase_merge(zs, s)


def conv_phase_dual(x1, x2, w1, w2, s):
    """Z = lhs1 @ w1 + lhs2 @ w2 per phase — both operands zero-copy views."""
    l1, l2 = _phase_lhs(x1), _phase_lhs(x2)
    zs = [
        jax.lax.dot_general(a, w1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        + jax.lax.dot_general(b, w2, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        for a, b in zip(l1, l2)
    ]
    return _phase_merge(zs, s)


def make_run_ff(conv, unroll, int8_mem=False):
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


def make_run_mixed(ff_conv, dual_conv, unroll):
    """Real LIFFireNet layout: units in REC are dual (ff + rec spikes)."""
    def run(x, mems, spks):
        def step(carry, _):
            h, mems, spks = carry
            new, new_s = [], []
            for i in range(L):
                if i in REC:
                    prev = spks[REC.index(i)]
                    y = dual_conv(h, prev, wsi[i], wri[i], scales[i])
                else:
                    y = ff_conv(h, wsi[i], scales[i])
                m = mems[i] * jnp.bfloat16(0.9) + y
                spk = m > jnp.bfloat16(1.0)
                h = spk.astype(jnp.int8)
                if i in REC:
                    new_s.append(h)
                new.append(jnp.where(spk, jnp.bfloat16(0), m))
            return (h, tuple(new), tuple(new_s)), h.astype(jnp.int32).sum()
        (h, mems, spks), s = jax.lax.scan(
            step, (x, mems, spks), None, length=T, unroll=unroll)
        return s.sum(), h
    return run


def check():
    a = np.asarray(conv_cols_dual(x0_i8, x0_i8, wsi[0], wri[0], scales[0]), np.float32)
    b = np.asarray(conv_phase_dual(x0_i8, x0_i8, wsi[0], wri[0], scales[0]), np.float32)
    print("dual phase vs cols max|d|:", np.abs(a - b).max())
    assert np.abs(a - b).max() == 0.0
    print("check OK", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["check", "a1", "a2", "a3", "a4", "b1", "c1", "c2"]
    if "check" in which:
        check()
    if "a1" in which:
        cs, t = timeit(jax.jit(make_run_ff(conv_cols, 4)), x0_i8, mems_bf)
        report("a1 cols unroll4          ", cs, t)
    if "a2" in which:
        cs, t = timeit(jax.jit(make_run_ff(conv_phase, 2)), x0_i8, mems_bf)
        report("a2 phase unroll2         ", cs, t)
    if "a3" in which:
        cs, t = timeit(jax.jit(make_run_ff(conv_phase, 4)), x0_i8, mems_bf)
        report("a3 phase unroll4         ", cs, t)
    if "a4" in which:
        cs, t = timeit(jax.jit(make_run_ff(conv_phase, 8)), x0_i8, mems_bf)
        report("a4 phase unroll8         ", cs, t)
    if "b1" in which:
        cs, t = timeit(jax.jit(make_run_ff(conv_phase, 4, int8_mem=True)),
                       x0_i8, mems_i8)
        report("b1 phase unroll4 i8-mem  ", cs, t)
    if "c1" in which:
        cs, t = timeit(jax.jit(make_run_mixed(conv_phase, conv_phase_dual, 4)),
                       x0_i8, mems_bf, spk0)
        report("c1 mixed phase unroll4   ", cs, t)
    if "c2" in which:
        cs, t = timeit(jax.jit(make_run_mixed(conv_cols, conv_cols_dual, 4)),
                       x0_i8, mems_bf, spk0)
        report("c2 mixed cols unroll4    ", cs, t)
