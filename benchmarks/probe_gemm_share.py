"""Probe: GEMM vs epilogue share of the deploy chain step.

g1: the v1 chain with the dy shift-add replaced by a trivial channel slice
    (y = Z[..., :C]) — GEMM + LIF only. The gap v1 - g1 is the epilogue
    pattern cost; g1 is the bound on ANY epilogue optimization.
g2: g1 with the LIF also removed (y feeds the next cols directly via a
    threshold) — GEMM + cols only.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, W, C = 8, 256, 256, 32
L, T = 9, 16
key = jax.random.PRNGKey(0)


def timeit(fn, *args):
    t0 = time.time()
    out = fn(*args); _ = float(out[0] if isinstance(out, tuple) else out)
    cs = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args); _ = float(out[0] if isinstance(out, tuple) else out)
        best = min(best, time.perf_counter() - t0)
    return cs, best


ws96 = [
    (jax.random.normal(jax.random.fold_in(key, i), (9 * C, C), jnp.float32) * 0.05)
    .reshape(3, 3, C, C).transpose(1, 2, 0, 3).reshape(3 * C, 3 * C)
    for i in range(L)
]
wsi = [jnp.clip(jnp.round(w * 127 / jnp.max(jnp.abs(w))), -127, 127).astype(jnp.int8)
       for w in ws96]
scales = [jnp.bfloat16(float(jnp.max(jnp.abs(w))) / 127.0) for w in ws96]
x0_i8 = (jax.random.uniform(key, (B, H, W, C), jnp.float32) < 0.15).astype(jnp.int8)
mems_bf = tuple(jnp.zeros((B, H, W, C), jnp.bfloat16) for _ in range(L))


def gemm(x_i8, w_i8, s):
    xp = jnp.pad(x_i8, ((0, 0), (0, 0), (1, 1), (0, 0)))
    cols = jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)
    return jax.lax.dot_general(
        cols.reshape(-1, 3 * C), w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * s


def run_g1(x, mems):
    def step(carry, _):
        h, mems = carry
        new = []
        for i in range(L):
            y = gemm(h, wsi[i], scales[i])[..., :C]  # no shift-add
            mem2 = mems[i] * jnp.bfloat16(0.9) + y
            spk = mem2 > jnp.bfloat16(1.0)
            h = spk.astype(jnp.int8)
            new.append(jnp.where(spk, jnp.bfloat16(0), mem2))
        return (h, tuple(new)), h.astype(jnp.int32).sum()
    (h, mems2), s = jax.lax.scan(step, (x, mems), None, length=T)
    return s.sum(), h


def run_g2(x, _):
    def step(h, _):
        for i in range(L):
            y = gemm(h, wsi[i], scales[i])[..., :C]
            h = (y > jnp.bfloat16(1.0)).astype(jnp.int8)
        return h, h.astype(jnp.int32).sum()
    h, s = jax.lax.scan(step, x, None, length=T)
    return s.sum(), h


if __name__ == "__main__":
    which = sys.argv[1:] or ["g1", "g2"]
    if "g1" in which:
        cs, t = timeit(jax.jit(run_g1), x0_i8, mems_bf)
        print(f"g1 gemm+LIF, no shift-add: compile {cs:.0f}s, {t/T*1e3:.2f} ms/step"
              f" -> {T*B/t:.0f} win/s-equiv (v1 with shift-add: 1665)", flush=True)
    if "g2" in which:
        cs, t = timeit(jax.jit(run_g2), x0_i8, mems_bf)
        print(f"g2 gemm+threshold only   : compile {cs:.0f}s, {t/T*1e3:.2f} ms/step"
              f" -> {T*B/t:.0f} win/s-equiv", flush=True)
