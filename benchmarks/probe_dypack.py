"""Probe: dy-packed conv formulation vs plain im2col at the model scale.

Plain im2col does [BHW, 288] @ [288, 32] (N=32 -> 25% MXU lanes, 302 MB
cols). dy-packing moves the 3 vertical taps into the OUTPUT dim:

    cols  = concat_dx(shift_dx(x))            [BHW, 96]   (100 MB bf16)
    Z     = cols @ W'                          [BHW, 96]   N=96 -> 75% lanes
    y[r]  = Z[r+1, 0:32] + Z[r, 32:64] + Z[r-1, 64:96]     (shift-add epilogue)

where W'[(dx,ci),(dy,co)] = w[dy,dx,ci,co]. Identical FLOPs, 3x lane use,
3x smaller materialized cols. This probe runs a 9-conv LIF-ish chain per
step x T steps in both formulations (bf16 and int8) and reports ms/step.
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
    out = fn(*args); _ = float(out[0].sum() if isinstance(out, tuple) else out.sum())
    cs = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args); _ = float(out[0].sum() if isinstance(out, tuple) else out.sum())
        best = min(best, time.perf_counter() - t0)
    return cs, best


def report(name, cs, t):
    print(f"{name}: compile {cs:.0f}s, {t/T*1e3:.2f} ms/step -> {T*B/t:.0f} win/s-equiv", flush=True)


# ---------------- baseline: plain im2col N=32 ----------------
def conv_im2col(x, w288):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, dy : dy + H, dx : dx + W, :] for dy in range(3) for dx in range(3)],
        axis=-1,
    )
    return (cols.reshape(-1, 9 * C) @ w288).reshape(B, H, W, C)


def lif(ff, mem):
    mem2 = mem * jnp.bfloat16(0.9) + ff.astype(jnp.bfloat16)
    spk = (mem2 > jnp.bfloat16(1.0)).astype(jnp.bfloat16)
    return spk, mem2 * (jnp.bfloat16(1.0) - spk)


ws288 = [jax.random.normal(jax.random.fold_in(key, i), (9 * C, C), jnp.bfloat16) * 0.05
         for i in range(L)]
x0 = (jax.random.uniform(key, (B, H, W, C), jnp.bfloat16) < 0.15).astype(jnp.bfloat16)
mems0 = tuple(jnp.zeros((B, H, W, C), jnp.bfloat16) for _ in range(L))


@jax.jit
def run_base(x, mems, ws):
    def step(carry, _):
        h, mems = carry
        new = []
        for i in range(L):
            ff = conv_im2col(h, ws[i])
            h, m = lif(ff, mems[i])
            new.append(m)
        return (h, tuple(new)), h.sum()
    (h, mems), s = jax.lax.scan(step, (x, mems), None, length=T)
    return s.sum(), h


cs, t = timeit(run_base, x0, mems0, ws288)
report("baseline im2col N=32 bf16", cs, t)


# ---------------- dy-packed: N=96 + shift-add epilogue ----------------
def conv_dypack(x, w96):
    # cols: dx shifts into K (96); dy packed into N via w96 [96, 96]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    cols = jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)
    Z = (cols.reshape(-1, 3 * C) @ w96).reshape(B, H, W, 3, C)
    # y[r] = Z[r+1, dy=0] + Z[r, dy=1] + Z[r-1, dy=2]  (SAME padding in y)
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    return Zp[:, 2 : 2 + H, :, 0] + Zp[:, 1 : 1 + H, :, 1] + Zp[:, 0:H, :, 2]


# w96[(dx,ci),(dy,co)] = w288[(dy,dx,ci), co]
ws96 = [w.reshape(3, 3, C, C).transpose(1, 2, 0, 3).reshape(3 * C, 3 * C) for w in ws288]


@jax.jit
def run_dypack(x, mems, ws):
    def step(carry, _):
        h, mems = carry
        new = []
        for i in range(L):
            ff = conv_dypack(h, ws[i])
            h, m = lif(ff, mems[i])
            new.append(m)
        return (h, tuple(new)), h.sum()
    (h, mems), s = jax.lax.scan(step, (x, mems), None, length=T)
    return s.sum(), h


cs, t = timeit(run_dypack, x0, mems0, ws96)
report("dy-packed N=96 bf16      ", cs, t)

# numerics check: same result as baseline conv
ya = conv_im2col(x0, ws288[0]).astype(jnp.float32)
yb = conv_dypack(x0, ws96[0]).astype(jnp.float32)
err = float(jnp.max(jnp.abs(ya - yb)))
print(f"dy-pack vs im2col max|diff| = {err:.2e}", flush=True)


# ---------------- dy-packed int8 ----------------
wsi = [jnp.clip(jnp.round(w * 127 / jnp.max(jnp.abs(w))), -127, 127).astype(jnp.int8)
       for w in ws96]


def conv_dypack_i8(x_i8, w_i8):
    xp = jnp.pad(x_i8, ((0, 0), (0, 0), (1, 1), (0, 0)))
    cols = jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)
    Z = jax.lax.dot_general(
        cols.reshape(-1, 3 * C), w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(B, H, W, 3, C)
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    return Zp[:, 2 : 2 + H, :, 0] + Zp[:, 1 : 1 + H, :, 1] + Zp[:, 0:H, :, 2]


def lif_i8(ff_i32, mem):
    ff = ff_i32.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 127.0)
    mem2 = mem * jnp.bfloat16(0.9) + ff
    spk = mem2 > jnp.bfloat16(1.0)
    return spk.astype(jnp.int8), mem2 * (jnp.bfloat16(1.0) - spk.astype(jnp.bfloat16))


x0i = x0.astype(jnp.int8)


@jax.jit
def run_dypack_i8(x, mems, ws):
    def step(carry, _):
        h, mems = carry
        new = []
        for i in range(L):
            ff = conv_dypack_i8(h, ws[i])
            h, m = lif_i8(ff, mems[i])
            new.append(m)
        return (h, tuple(new)), h.astype(jnp.float32).sum()
    (h, mems), s = jax.lax.scan(step, (x, mems), None, length=T)
    return s.sum(), h


cs, t = timeit(run_dypack_i8, x0i, mems0, wsi)
report("dy-packed N=96 int8      ", cs, t)


# ---------------- plain im2col int8 control ----------------
wsi288 = [jnp.clip(jnp.round(w * 127 / jnp.max(jnp.abs(w))), -127, 127).astype(jnp.int8)
          for w in ws288]


def conv_im2col_i8(x_i8, w_i8):
    xp = jnp.pad(x_i8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, dy : dy + H, dx : dx + W, :] for dy in range(3) for dx in range(3)],
        axis=-1,
    )
    return jax.lax.dot_general(
        cols.reshape(-1, 9 * C), w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(B, H, W, C)


@jax.jit
def run_base_i8(x, mems, ws):
    def step(carry, _):
        h, mems = carry
        new = []
        for i in range(L):
            ff = conv_im2col_i8(h, ws[i])
            h, m = lif_i8(ff, mems[i])
            new.append(m)
        return (h, tuple(new)), h.astype(jnp.float32).sum()
    (h, mems), s = jax.lax.scan(step, (x, mems), None, length=T)
    return s.sum(), h


cs, t = timeit(run_base_i8, x0i, mems0, wsi288)
report("baseline im2col N=32 int8", cs, t)
