"""Probe 3: dy-pack with the K-side (dx window) done by a native 1x3 XLA
conv to Cout=3C=96 — no materialized cols buffer — vs the matmul form.
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
    out = fn(*args); _ = float(out[0].sum())
    cs = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args); _ = float(out[0].sum())
        best = min(best, time.perf_counter() - t0)
    return cs, best


def report(name, cs, t):
    print(f"{name}: compile {cs:.0f}s, {t/T*1e3:.2f} ms/step -> {T*B/t:.0f} win/s-equiv", flush=True)


def lif(ff, mem):
    mem2 = mem * jnp.bfloat16(0.9) + ff.astype(jnp.bfloat16)
    spk = (mem2 > jnp.bfloat16(1.0)).astype(jnp.bfloat16)
    return spk, mem2 * (jnp.bfloat16(1.0) - spk)


def epilogue(Z):
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return (
        Zp[:, 0:H, :, 0:C]
        + Zp[:, 1 : 1 + H, :, C : 2 * C]
        + Zp[:, 2 : 2 + H, :, 2 * C : 3 * C]
    )


ws288 = [jax.random.normal(jax.random.fold_in(key, i), (9 * C, C), jnp.bfloat16) * 0.05
         for i in range(L)]
# matmul form: w96[(dx,ci),(dy,co)]
ws96 = [w.reshape(3, 3, C, C).transpose(1, 2, 0, 3).reshape(3 * C, 3 * C) for w in ws288]
# conv form: kernel [kh=1, kw=3, Cin=C, Cout=3C] with Cout index (dy, co)
wsconv = [w.reshape(3, 3, C, C).transpose(1, 2, 0, 3).reshape(1, 3, C, 3 * C) for w in ws288]

x0 = (jax.random.uniform(key, (B, H, W, C), jnp.bfloat16) < 0.15).astype(jnp.bfloat16)
mems0 = tuple(jnp.zeros((B, H, W, C), jnp.bfloat16) for _ in range(L))


def conv_dypack_mm(x, w96):
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    cols = jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)
    Z = (cols.reshape(-1, 3 * C) @ w96).reshape(B, H, W, 3 * C)
    return epilogue(Z)


def conv_dypack_conv(x, wc):
    Z = jax.lax.conv_general_dilated(
        x, wc, (1, 1), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    return epilogue(Z)


ya = conv_dypack_mm(x0, ws96[0]).astype(jnp.float32)
yb = conv_dypack_conv(x0, wsconv[0]).astype(jnp.float32)
print(f"conv1x3 vs matmul max|diff| = {float(jnp.max(jnp.abs(ya - yb))):.2e}", flush=True)


def run_chain(conv, ws):
    @jax.jit
    def run(x, mems):
        def step(carry, _):
            h, mems = carry
            new = []
            for i in range(L):
                ff = conv(h, ws[i])
                h, m = lif(ff, mems[i])
                new.append(m)
            return (h, tuple(new)), h.sum()
        (h, mems), s = jax.lax.scan(step, (x, mems), None, length=T)
        return s.sum(), h
    return run


cs, t = timeit(run_chain(conv_dypack_conv, wsconv), x0, mems0)
report("dy-pack conv1x3->96 bf16", cs, t)

cs, t = timeit(run_chain(conv_dypack_mm, ws96), x0, mems0)
report("dy-pack matmul bf16      ", cs, t)


# full 3x3 native conv at Cout=96? No — control: plain 3x3 lax conv Cout=32
ws33 = [w.reshape(3, 3, C, C) for w in ws288]


def conv_lax33(x, wc):
    return jax.lax.conv_general_dilated(
        x, wc, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


cs, t = timeit(run_chain(conv_lax33, ws33), x0, mems0)
report("plain lax 3x3 conv bf16  ", cs, t)
