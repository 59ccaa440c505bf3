"""Probe: the two unmeasured conv formulations on the int8 deploy chain.

Verdict round-2 item 1a: the full dy+dx output-pack has never been measured.
Also probes a new cols-free schedule ("phase-slice") that removes the
materialized cols buffer — the dominant non-GEMM HBM term — via contiguous
flat-row views.

Variants (9-conv LIF chain, B=8 256x256 C=32, int8 weights hoisted, int8
spike carries, bf16 membranes — comparable to probe_int8_deploy.py v1 1665):

  v1  baseline   : current engine schedule (cols_dx materialized, K=3C dot
                   N=3C, dy shift-add epilogue). = probe_int8_deploy v1.
  v6  dy9pack    : FULL pack [BHW, C] @ [C, 9C] — N=288 (>128 lanes), NO
                   cols buffer at all, 9-tap pad+slice shift-add epilogue.
                   Z is 3x wider (9C bf16) so HBM accounting predicts a
                   loss; measured because it is the one untested cell.
  v5  phase-slice: dy-pack GEMM with ZERO cols buffer: pad x to width
                   Wo+2 (Wo = 3*ceil(W/3)), flatten the row to
                   [(Wo+2)*C]; for phase r in 0..2 the lhs rows
                   x = 3*k + r are CONTIGUOUS slices
                   xf[rC : rC + Wo*C].reshape(-1, 3C) — the dot reads the
                   padded input directly (zero-copy slice), outputs
                   interleave at the (3x smaller) y level after the dy
                   epilogue. Saves cols write+read (~192 B/px of ~576).
  v7  unroll2    : v1 with lax.scan(unroll=2) — does pipelining across
                   windows hide any epilogue latency?

Run: python benchmarks/probe_dy9pack.py [v1 v5 v6 v7 check]
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
Wo = 3 * ((W + 2) // 3)  # 258: phase-sliced output width (trim to W)
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


# f32 reference kernels [3,3,C,C] (dy, dx, ci, co)
ks = [
    jax.random.normal(jax.random.fold_in(key, i), (3, 3, C, C), jnp.float32) * 0.05
    for i in range(L)
]
# dy-packed [(dx,ci),(dy,co)] int8 (dypack.pack_kernel_dy layout)
ws96 = [k.transpose(1, 2, 0, 3).reshape(3 * C, 3 * C) for k in ks]
wsi = [jnp.clip(jnp.round(w * 127 / jnp.max(jnp.abs(w))), -127, 127).astype(jnp.int8)
       for w in ws96]
scales = [jnp.bfloat16(float(jnp.max(jnp.abs(w))) / 127.0) for w in ws96]
# full-pack [ci, (dy,dx,co)] int8 on the SAME int8 grid as wsi
ws9 = [
    jnp.clip(jnp.round(k.transpose(2, 0, 1, 3).reshape(C, 9 * C)
                       * (127 / jnp.max(jnp.abs(w96)))), -127, 127).astype(jnp.int8)
    for k, w96 in zip(ks, ws96)
]

x0_i8 = (jax.random.uniform(key, (B, H, W, C), jnp.float32) < 0.15).astype(jnp.int8)
mems_bf = tuple(jnp.zeros((B, H, W, C), jnp.bfloat16) for _ in range(L))


def epilogue_dy(Z):
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return (
        Zp[:, 0:H, :, 0:C]
        + Zp[:, 1 : 1 + H, :, C : 2 * C]
        + Zp[:, 2 : 2 + H, :, 2 * C : 3 * C]
    )


def conv_v1(x_i8, w_i8, s):
    xp = jnp.pad(x_i8, ((0, 0), (0, 0), (1, 1), (0, 0)))
    cols = jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)
    Z = jax.lax.dot_general(
        cols.reshape(-1, 3 * C), w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * s
    return epilogue_dy(Z)


def conv_v6(x_i8, w9_i8, s):
    """Full dy+dx pack: one [BHW, C] @ [C, 9C] dot, 9-tap epilogue."""
    Z = jax.lax.dot_general(
        x_i8.reshape(-1, C), w9_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.bfloat16).reshape(B, H, W, 9 * C) * s
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jnp.zeros((B, H, W, C), jnp.bfloat16)
    for dy in range(3):
        for dx in range(3):
            c0 = (dy * 3 + dx) * C
            y = y + Zp[:, dy : dy + H, dx : dx + W, c0 : c0 + C]
    return y


def conv_v5(x_i8, w_i8, s):
    """Phase-sliced dy-pack: no cols buffer. lhs per phase r is a contiguous
    slice of the flattened padded row."""
    # pad: left 1 (dx-1), right Wo+2-W-1 so width = Wo + 2
    xp = jnp.pad(x_i8, ((0, 0), (0, 0), (1, Wo + 1 - W), (0, 0)))
    xf = xp.reshape(B, H, (Wo + 2) * C)
    ys = []
    for r in range(3):
        lhs = jax.lax.slice_in_dim(xf, r * C, r * C + Wo * C, axis=2)
        lhs = lhs.reshape(B * H * (Wo // 3), 3 * C)
        Z = jax.lax.dot_general(
            lhs, w_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.bfloat16).reshape(B, H, Wo // 3, 3 * C) * s
        # dy epilogue per phase (dy shifts are along H, x-phase independent)
        Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0)))
        ys.append(
            Zp[:, 0:H, :, 0:C]
            + Zp[:, 1 : 1 + H, :, C : 2 * C]
            + Zp[:, 2 : 2 + H, :, 2 * C : 3 * C]
        )
    # interleave phases: x = 3*k + r
    y = jnp.stack(ys, axis=3).reshape(B, H, Wo, C)
    return y[:, :, :W, :]


def make_run(conv, ws, unroll=1):
    def run(x, mems):
        def step(carry, _):
            h, mems = carry
            new = []
            for i in range(L):
                y = conv(h, ws[i], scales[i])
                mem2 = mems[i] * jnp.bfloat16(0.9) + y
                spk = mem2 > jnp.bfloat16(1.0)
                h = spk.astype(jnp.int8)
                new.append(jnp.where(spk, jnp.bfloat16(0), mem2))
            return (h, tuple(new)), h.astype(jnp.int32).sum()
        (h, mems), s = jax.lax.scan(step, (x, mems), None, length=T, unroll=unroll)
        return s.sum(), h
    return run


def check():
    """All three convs must agree exactly (identical int8 grid, int32 acc)."""
    x = x0_i8
    a = np.asarray(conv_v1(x, wsi[0], scales[0]), np.float32)
    b = np.asarray(conv_v6(x, ws9[0], scales[0]), np.float32)
    c = np.asarray(conv_v5(x, wsi[0], scales[0]), np.float32)
    print("v6 vs v1 max|d|:", np.abs(a - b).max())
    print("v5 vs v1 max|d|:", np.abs(a - c).max())
    # v6 sums 9 bf16 taps vs v1's 3 — bf16 rounding-order noise only
    assert np.abs(a - b).max() < 0.05, "v6 mismatch"
    assert np.abs(a - c).max() == 0.0, "v5 mismatch"
    print("check OK", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["check", "v1", "v5", "v6", "v7"]
    if "check" in which:
        check()
    if "v1" in which:
        cs, t = timeit(jax.jit(make_run(conv_v1, wsi)), x0_i8, mems_bf)
        report("v1 baseline cols+dy      ", cs, t)
    if "v5" in which:
        cs, t = timeit(jax.jit(make_run(conv_v5, wsi)), x0_i8, mems_bf)
        report("v5 phase-slice no-cols   ", cs, t)
    if "v6" in which:
        cs, t = timeit(jax.jit(make_run(conv_v6, ws9)), x0_i8, mems_bf)
        report("v6 full dy+dx 9-pack     ", cs, t)
    if "v7" in which:
        cs, t = timeit(jax.jit(make_run(conv_v1, wsi, unroll=2)), x0_i8, mems_bf)
        report("v7 v1 + scan unroll=2    ", cs, t)
