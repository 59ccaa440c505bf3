"""Can the UNet's expensive stride-1 convs ride the dy-pack cols GEMM?

The FireNet engine's speed comes from the s8 1x1/cols emitter (dy-pack,
evflow/ops/dypack.py), not plain NHWC convs. The UNet engine currently
uses lax.conv; at 256² the decoder convs dominate (dec3 ~283 µs,
probe_unet_conv.py). This probe times the SAME layer shapes through
conv3x3_dypack (int8 cols GEMM + dy shift-add) vs the NHWC paths.

Timing harness: carry-dependent input + full-output reduction (see
probe_unet_conv.py — loop-invariant hoisting and DCE both produce
fake flat timings otherwise).
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

B, R, C = 1, int(os.environ.get("EVRES", "256")), 32
SHAPES = [
    ("enc0.rec(dual)", R // 2, 4 * C, 2 * C),
    ("enc1.rec(dual)", R // 4, 8 * C, 4 * C),
    ("res.conv", R // 16, 16 * C, 16 * C),
    ("dec0", R // 8, 32 * C, 8 * C),
    ("dec1", R // 4, 16 * C + 2, 4 * C),
    ("dec2", R // 2, 8 * C + 2, 2 * C),
    ("dec3", R, 4 * C + 2, C),
]
S = 1024


def timeit(run, x, w):
    out = run(x, w)
    float(out)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = run(x, w)
        float(out)
        best = min(best, time.perf_counter() - t0)
    return best / S


def main():
    rng = np.random.default_rng(0)
    for name, HW, Cin, Cout in SHAPES:
        x8 = jnp.asarray(rng.integers(0, 2, (B, HW, HW, Cin)), jnp.int8)
        k = jnp.asarray(rng.integers(-127, 128, (3, 3, Cin, Cout)), jnp.int8)
        wp = pack_kernel_dy(k)  # [3*Cin, 3*Cout] int8

        @jax.jit
        def run_dypack(x, wp):
            def body(c, _):
                xi = x + c.astype(x.dtype)
                cols = cols_dx(xi)
                Z = jax.lax.dot_general(
                    cols.reshape(-1, cols.shape[-1]), wp,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.bfloat16).reshape(B, HW, HW, 3 * Cout)
                y = dy_epilogue(Z, HW, Cout)
                return (y.sum() % jnp.asarray(2, jnp.bfloat16)).astype(
                    jnp.int32), None

            s, _ = jax.lax.scan(body, jnp.asarray(0, jnp.int32), None,
                                length=S)
            return s

        @jax.jit
        def run_nhwc(x, w):
            def body(c, _):
                y = jax.lax.conv_general_dilated(
                    x + c.astype(x.dtype), w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                return (y.sum() % jnp.asarray(2, jnp.int32)).astype(
                    jnp.int32), None

            s, _ = jax.lax.scan(body, jnp.asarray(0, jnp.int32), None,
                                length=S)
            return s

        t_dy = timeit(run_dypack, x8, wp)
        t_nh = timeit(run_nhwc, x8, k)
        print(f"{name:16s} [{HW:3d}² {Cin:4d}->{Cout:4d}] "
              f"dypack {t_dy*1e6:7.1f}us | s8-NHWC {t_nh*1e6:7.1f}us "
              f"({t_nh/t_dy:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
