"""Probe: stride-2 encoder conv lowering after the symmetric-padding fix.

The round-4 padding correction (symmetric k//2 = torch alignment, vs the
flax-"SAME" (0,1) asymmetric pad that computed a different convolution)
cost ~7% on the 128^2 UNet phase step. This probe times the per-shape
stride-2 conv under three lowerings at the engine's encoder shapes:

  sym   : lax.conv with padding ((1,1),(1,1))  — shipped
  valid : jnp.pad the input then VALID conv    — same math, explicit pad op
  asym  : lax.conv with padding ((0,1),(0,1))  — the OLD (wrong) alignment,
          as the speed reference for the gap

Carry-dependent scan harness (round-8 methodology note: loop-invariant
inputs get hoisted and DCE'd; the carry feeds the input and the output
reduces into the carry). int8 weights, bf16 carrier (the hybrid tiers'
default at 128^2). Run: python benchmarks/probe_stride2_pad.py
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T = 256
# (H, Cin, Cout) for the C=32 UNet encoders at 128^2 and 256^2 serving
SHAPES = [
    (128, 2, 64), (64, 64, 128), (32, 128, 256), (16, 256, 512),
    (256, 2, 64), (128, 64, 128), (64, 128, 256), (32, 256, 512),
]


def make_run(H, Cin, Cout, mode):
    key = jax.random.PRNGKey(0)
    w = jnp.clip(jnp.round(jax.random.normal(key, (3, 3, Cin, Cout)) * 40),
                 -127, 127).astype(jnp.int8)
    x0 = (jax.random.uniform(key, (1, H, H, Cin)) < 0.2).astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    def conv(x):
        if mode == "valid":
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            return jax.lax.conv_general_dilated(
                xp, wb, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
        pad = ((1, 1), (1, 1)) if mode == "sym" else ((0, 1), (0, 1))
        return jax.lax.conv_general_dilated(
            x, wb, (2, 2), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def step(carry, _):
        x = carry
        y = conv(x)
        # fold the output back into a same-shaped carry (upsample by
        # nearest repeat + slice channels) so every step depends on the last
        yb = (y > 0.5).astype(jnp.bfloat16)
        up = jnp.repeat(jnp.repeat(yb, 2, axis=1), 2, axis=2)[..., :Cin]
        if up.shape[-1] < Cin:
            up = jnp.pad(up, ((0, 0),) * 3 + ((0, Cin - up.shape[-1]),))
        return up, ()

    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(step, x, None, length=T)
        return out.astype(jnp.float32).sum()

    return run, x0


def timeit(run, x0):
    t0 = time.time()
    _ = float(run(x0))
    cs = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(x0))
        best = min(best, time.perf_counter() - t0)
    return cs, best / T * 1e6  # us per conv


if __name__ == "__main__":
    print(f"{'shape':>16s} | {'sym us':>8s} {'valid us':>8s} {'asym us':>8s}")
    for H, Cin, Cout in SHAPES:
        row = []
        for mode in ("sym", "valid", "asym"):
            run, x0 = make_run(H, Cin, Cout, mode)
            cs, us = timeit(run, x0)
            row.append(us)
        print(f"{H:4d}^2 {Cin:3d}->{Cout:3d} | {row[0]:8.1f} {row[1]:8.1f} "
              f"{row[2]:8.1f}", flush=True)
