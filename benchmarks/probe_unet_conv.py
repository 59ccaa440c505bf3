"""Per-layer conv dtype probe at SpikingRecEVFlowNet shapes (C=32, 128²).

Q: is s8 x s8 -> s32 ``lax.conv_general_dilated`` actually fast for the
UNet's 3x3 convs on this chip, or does only the 1x1/cols int8 emitter
(ROOFLINE §1) hit the MXU int8 path? Times each encoder/resblock/decoder
conv in int8 / bf16 / f32, scanned 64x per dispatch (amortizes the ~35 ms
tunnel roundtrip), min-of-4.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os
B, R, C = 1, int(os.environ.get("EVRES", "128")), 32
# (H, W, Cin, Cout, stride) — the C=32 UNet plan at EVRES (default 128)
SHAPES = [
    ("enc0.ff", R, R, 2, 2 * C, 2),
    ("enc0.rec(dual)", R // 2, R // 2, 4 * C, 2 * C, 1),
    ("enc1.ff", R // 2, R // 2, 2 * C, 4 * C, 2),
    ("enc1.rec(dual)", R // 4, R // 4, 8 * C, 4 * C, 1),
    ("enc2.ff", R // 4, R // 4, 4 * C, 8 * C, 2),
    ("enc2.rec(dual)", R // 8, R // 8, 16 * C, 8 * C, 1),
    ("enc3.ff", R // 8, R // 8, 8 * C, 16 * C, 2),
    ("enc3.rec(dual)", R // 16, R // 16, 32 * C, 16 * C, 1),
    ("res.conv", R // 16, R // 16, 16 * C, 16 * C, 1),
    ("dec0", R // 8, R // 8, 32 * C, 8 * C, 1),
    ("dec1", R // 4, R // 4, 16 * C + 2, 4 * C, 1),
    ("dec2", R // 2, R // 2, 8 * C + 2, 2 * C, 1),
    ("dec3", R, R, 4 * C + 2, C, 1),
]


def timeit(fn, *args, iters=4):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    S = 2048  # ~35 ms/dispatch wire tax -> <20us/step residual
    for name, H, W, Cin, Cout, stride in SHAPES:
        row = [f"{name:16s} [{H:3d}x{W:3d} {Cin:4d}->{Cout:4d} s{stride}]"]
        for dt_in, dt_w, acc in (
            (jnp.int8, jnp.int8, jnp.int32),
            (jnp.bfloat16, jnp.bfloat16, jnp.float32),
            (jnp.float32, jnp.float32, jnp.float32),
        ):
            x = jnp.asarray(rng.integers(0, 2, (B, H, W, Cin)), dt_in)
            w = jnp.asarray(rng.integers(-127, 128, (3, 3, Cin, Cout)), dt_w)

            @jax.jit
            def run(x, w):
                def body(c, _):
                    # carry-dependent input defeats loop-invariant hoisting,
                    # and the FULL-output reduction defeats dead-code
                    # elimination (reading one output element lets XLA
                    # compute one pixel's dot — the first two versions of
                    # this file measured nothing but scan overhead)
                    y = jax.lax.conv_general_dilated(
                        x + c.astype(x.dtype), w, (stride, stride), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=acc,
                    )
                    return (y.sum() % jnp.asarray(2, acc)).astype(
                        jnp.int32), None

                s, _ = jax.lax.scan(
                    body, jnp.asarray(0, jnp.int32), None, length=S)
                return s

            t = timeit(run, x, w) / S
            gops = 2 * (H // stride) * (W // stride) * Cin * Cout * 9 / 1e9
            row.append(f"{str(dt_in.__name__ if hasattr(dt_in, '__name__') else dt_in):>9s}"
                       f" {t*1e6:8.1f}us {gops/t:7.1f}GOP/s")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
