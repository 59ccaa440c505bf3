"""Probe 2: dy-pack refinements. Fix the epilogue dy order, keep Z flat
[B,H,W,96] (minor dim 96 not 32), try no-cols 3-dot form and int8 cols with
an immediately-cast bf16 Z.
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


ws288 = [jax.random.normal(jax.random.fold_in(key, i), (9 * C, C), jnp.bfloat16) * 0.05
         for i in range(L)]
# w96[(dx,ci),(dy,co)]
ws96 = [w.reshape(3, 3, C, C).transpose(1, 2, 0, 3).reshape(3 * C, 3 * C) for w in ws288]
x0 = (jax.random.uniform(key, (B, H, W, C), jnp.bfloat16) < 0.15).astype(jnp.bfloat16)
mems0 = tuple(jnp.zeros((B, H, W, C), jnp.bfloat16) for _ in range(L))


def conv_im2col(x, w288):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, dy : dy + H, dx : dx + W, :] for dy in range(3) for dx in range(3)],
        axis=-1,
    )
    return (cols.reshape(-1, 9 * C) @ w288).reshape(B, H, W, C)


def epilogue(Z):
    """y[r,co] = Z[r-1, 0:C] + Z[r, C:2C] + Z[r+1, 2C:3C], flat-layout reads."""
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return (
        Zp[:, 0:H, :, 0:C]
        + Zp[:, 1 : 1 + H, :, C : 2 * C]
        + Zp[:, 2 : 2 + H, :, 2 * C : 3 * C]
    )


def conv_dypack(x, w96):
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    cols = jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)
    Z = (cols.reshape(-1, 3 * C) @ w96).reshape(B, H, W, 3 * C)
    return epilogue(Z)


# numerics check first (cheap on-device)
ya = conv_im2col(x0, ws288[0]).astype(jnp.float32)
yb = conv_dypack(x0, ws96[0]).astype(jnp.float32)
print(f"dy-pack(flatZ) vs im2col max|diff| = {float(jnp.max(jnp.abs(ya - yb))):.2e}", flush=True)


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

cs, t = timeit(run_chain(conv_dypack, ws96), x0, mems0)
report("dy-pack flat-Z bf16        ", cs, t)


# --- no-cols: 3 dots on dx-shifted x directly ---
ws32 = [[w.reshape(3, C, 3 * C)[dx] for dx in range(3)] for w in ws96]


def conv_dypack_nocols(x, w3):
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    Z = None
    for dx in range(3):
        zz = (xp[:, :, dx : dx + W, :].reshape(-1, C) @ w3[dx]).reshape(B, H, W, 3 * C)
        Z = zz if Z is None else Z + zz
    return epilogue(Z)


yc = conv_dypack_nocols(x0, ws32[0]).astype(jnp.float32)
print(f"no-cols vs im2col max|diff| = {float(jnp.max(jnp.abs(ya - yc))):.2e}", flush=True)

cs, t = timeit(run_chain(conv_dypack_nocols, ws32), x0, mems0)
report("dy-pack no-cols 3-dot bf16 ", cs, t)


# --- int8 cols, Z cast to bf16 right at the dot output ---
wsi = [jnp.clip(jnp.round(w * 127 / jnp.max(jnp.abs(w))), -127, 127).astype(jnp.int8)
       for w in ws96]
scales = [jnp.bfloat16(float(jnp.max(jnp.abs(w))) / 127.0) for w in ws96]


def make_conv_i8(w_i8, s):
    def conv(x, _unused):
        xi = x.astype(jnp.int8)
        xp = jnp.pad(xi, ((0, 0), (0, 0), (1, 1), (0, 0)))
        cols = jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)
        Z = jax.lax.dot_general(
            cols.reshape(-1, 3 * C), w_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * s
        return epilogue(Z)
    return conv


def run_chain_i8():
    convs = [make_conv_i8(wsi[i], scales[i]) for i in range(L)]

    @jax.jit
    def run(x, mems):
        def step(carry, _):
            h, mems = carry
            new = []
            for i in range(L):
                ff = convs[i](h, None)
                h, m = lif(ff, mems[i])
                new.append(m)
            return (h, tuple(new)), h.sum()
        (h, mems), s = jax.lax.scan(step, (x, mems), None, length=T)
        return s.sum(), h
    return run

cs, t = timeit(run_chain_i8(), x0, mems0)
report("dy-pack int8-cols bf16-Z   ", cs, t)
