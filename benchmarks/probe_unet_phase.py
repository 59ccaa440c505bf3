"""Phase-decomposed decoder conv: fold bilinear x2 INTO the kernels.

conv3x3(bilinear_up2(x)) is algebraically 4 phase convs at the LOW
resolution: each output-pixel phase (p, q) in {0,1}^2 has an effective
3x3 kernel k_pq = sum over taps of k * a(p+dy-1, m_y) * a(q+dx-1, m_x),
where a(n, m) are the half-pixel bilinear row weights
(U[2i-1] = .75 x[i-1] + .25 x[i], U[2i] = .25 x[i-1] + .75 x[i], ...).
This skips the materialized upsampled tensor AND the decoder quantize
chain entirely (the fractional bilinear taps move into the WEIGHTS,
which are per-phase int8-quantized).

This probe (a) verifies interior exactness of the decomposition vs
resize+conv in f32, and (b) times the current engine chain
(resize f32 -> round/clip -> cols -> s8 dot) against the phase chain
(4 low-res cols -> 4 s8 dots -> interleave) at the UNet decoder shapes.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from evflow.ops.dypack import cols_dx, dy_epilogue, pack_kernel_dy

# bilinear row weights a[n+1][m+1]: coefficient of x[i+m] in the
# upsampled row at output index 2i+n (n in {-1..2}, m in {-1..1})
_A = np.zeros((4, 3), np.float32)
_A[0, 0], _A[0, 1] = 0.75, 0.25   # n=-1
_A[1, 0], _A[1, 1] = 0.25, 0.75   # n=0
_A[2, 1], _A[2, 2] = 0.75, 0.25   # n=1
_A[3, 1], _A[3, 2] = 0.25, 0.75   # n=2


def phase_kernels(k):
    """[3,3,Cin,Cout] -> [2,2,3,3,Cin,Cout] phase kernels."""
    out = np.zeros((2, 2, 3, 3) + k.shape[2:], np.float32)
    for p in range(2):
        for q in range(2):
            for dy in range(3):
                for dx in range(3):
                    for my in range(3):
                        for mx in range(3):
                            out[p, q, my, mx] += (
                                k[dy, dx] * _A[p + dy, my] * _A[q + dx, mx]
                            )
    return out


def up2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def check_exactness():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 3)), jnp.float32)
    k = rng.normal(0, 1, (3, 3, 3, 5)).astype(np.float32)
    ref = np.asarray(conv(up2(x), jnp.asarray(k)))
    kp = phase_kernels(k)
    ys = {(p, q): np.asarray(conv(x, jnp.asarray(kp[p, q])))
          for p in range(2) for q in range(2)}
    full = np.zeros_like(ref)
    for (p, q), y in ys.items():
        full[:, p::2, q::2] = y
    interior = np.abs(full - ref)[:, 2:-2, 2:-2]
    border = np.abs(full - ref).max()
    print(f"exactness: interior maxdiff {interior.max():.2e} "
          f"(border {border:.2e} — resize edge-clamps, SAME pads zero)")


def timeit(run, *args, S=512, iters=4):
    out = run(*args)
    float(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run(*args)
        float(out)
        best = min(best, time.perf_counter() - t0)
    return best / S


def main():
    check_exactness()
    R = int(os.environ.get("EVRES", "256"))
    C = 32
    S = 512
    SHAPES = [  # decoder conv shapes: (name, low-res H, Cin, Cout)
        ("dec1", R // 8, 16 * C + 2, 4 * C),
        ("dec2", R // 4, 8 * C + 2, 2 * C),
        ("dec3", R // 2, 4 * C + 2, C),
    ]
    rng = np.random.default_rng(0)
    for name, HW, Cin, Cout in SHAPES:
        x8 = jnp.asarray(rng.integers(0, 3, (1, HW, HW, Cin)), jnp.int8)
        k = rng.normal(0, 0.05, (3, 3, Cin, Cout)).astype(np.float32)
        # current chain: dequant -> resize f32 -> requant -> cols -> s8 dot
        wq = np.clip(np.round(k / (np.abs(k).max() / 127)), -127, 127
                     ).astype(np.int8)
        wp = jnp.asarray(pack_kernel_dy(jnp.asarray(wq)))

        @jax.jit
        def run_current(x, wp):
            def body(c, _):
                xf = (x + c.astype(x.dtype)).astype(jnp.float32)
                u = up2(xf)
                q = jnp.clip(jnp.round(u * 16.0), -127, 127).astype(jnp.int8)
                cols = cols_dx(q)
                Z = jax.lax.dot_general(
                    cols.reshape(-1, cols.shape[-1]), wp,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.bfloat16).reshape(1, 2 * HW, 2 * HW, 3 * Cout)
                y = dy_epilogue(Z, 2 * HW, Cout)
                return (y.sum() % jnp.asarray(2, jnp.bfloat16)).astype(
                    jnp.int32), None

            s, _ = jax.lax.scan(body, jnp.asarray(0, jnp.int32), None,
                                length=S)
            return s

        kp = phase_kernels(k)
        wps = []
        for p in range(2):
            for q in range(2):
                kq = np.clip(np.round(kp[p, q] / (np.abs(kp[p, q]).max() / 127)),
                             -127, 127).astype(np.int8)
                wps.append(jnp.asarray(pack_kernel_dy(jnp.asarray(kq))))

        @jax.jit
        def run_phase(x, w0, w1, w2, w3):
            ws = (w0, w1, w2, w3)

            def body(c, _):
                xi = x + c.astype(x.dtype)
                cols = cols_dx(xi).reshape(-1, 3 * Cin)
                ys = []
                for w in ws:
                    Z = jax.lax.dot_general(
                        cols, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.bfloat16).reshape(1, HW, HW, 3 * Cout)
                    ys.append(dy_epilogue(Z, HW, Cout))
                # interleave phases to [1, 2H, 2W, Cout]
                y = jnp.stack(ys, 0).reshape(2, 2, 1, HW, HW, Cout)
                y = y.transpose(2, 3, 0, 4, 1, 5).reshape(
                    1, 2 * HW, 2 * HW, Cout)
                return (y.sum() % jnp.asarray(2, jnp.bfloat16)).astype(
                    jnp.int32), None

            s, _ = jax.lax.scan(body, jnp.asarray(0, jnp.int32), None,
                                length=S)
            return s

        t_cur = timeit(run_current, x8, wp, S=S)
        t_ph = timeit(run_phase, x8, *wps, S=S)
        print(f"{name:6s} [{HW:3d}²->{2*HW:3d}² {Cin:4d}->{Cout:4d}] "
              f"resize+quant+cols {t_cur*1e6:7.1f}us | "
              f"4-phase {t_ph*1e6:7.1f}us ({t_cur/t_ph:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
