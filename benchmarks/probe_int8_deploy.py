"""Probe: deploy-grade int8 chain — what the round-2 model path left on the
table. The model's dypack_int8 (1697 win/s with dual ff+rec) still pays
per-step activation round/clip on bf16 spikes and carries bf16 states. Here
every cross-layer tensor is int8 at rest:

  v1 i8-spk    : int8 spike carries (no round/clip — spikes are exact 0/1),
                 hoisted int8 weights, bf16 membranes.
  v2 i8-all    : v1 + int8 membranes (per-layer scale, round+clip per step):
                 halves the mem r/w traffic, adds VPU quant work.
  v3 conv1x3   : v1 but the dx-GEMM expressed as lax.conv [1,3,32]->96 int8:
                 does XLA's conv emitter skip the cols materialization?
  v4 i4-cols   : v1 with int4 cols (spikes fit int4 exactly) — halves the
                 dominant A-operand stream if the MXU int4 path is real.

Chain harness matches probe_dypack2.py (L=9 convs, B=8, 256x256, C=32) so
numbers are comparable: bf16 1267, int8-cols-bf16-Z 1575.
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
    out = fn(*args); _ = float(out[0])
    cs = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args); _ = float(out[0])
        best = min(best, time.perf_counter() - t0)
    return cs, best


def report(name, cs, t):
    print(f"{name}: compile {cs:.0f}s, {t/T*1e3:.2f} ms/step -> {T*B/t:.0f} win/s-equiv", flush=True)


# hoisted int8 weights (per-tensor symmetric), dy-packed [(dx,ci),(dy,co)]
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
mems_i8 = tuple(jnp.zeros((B, H, W, C), jnp.int8) for _ in range(L))
MEMS = jnp.bfloat16(0.05)  # membrane quant scale (range ~[-6.4, 6.3])


def epilogue(Z):
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return (
        Zp[:, 0:H, :, 0:C]
        + Zp[:, 1 : 1 + H, :, C : 2 * C]
        + Zp[:, 2 : 2 + H, :, 2 * C : 3 * C]
    )


def conv_i8(x_i8, w_i8, s):
    """x int8 -> y bf16 via dy-packed int8 GEMM."""
    xp = jnp.pad(x_i8, ((0, 0), (0, 0), (1, 1), (0, 0)))
    cols = jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)
    Z = jax.lax.dot_general(
        cols.reshape(-1, 3 * C), w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * s
    return epilogue(Z)


def run_v1(x, mems):
    def step(carry, _):
        h, mems = carry  # h: int8 spikes
        new = []
        for i in range(L):
            y = conv_i8(h, wsi[i], scales[i])
            mem2 = mems[i] * jnp.bfloat16(0.9) + y
            spk = mem2 > jnp.bfloat16(1.0)
            h = spk.astype(jnp.int8)
            new.append(jnp.where(spk, jnp.bfloat16(0), mem2))
        return (h, tuple(new)), h.astype(jnp.int32).sum()
    (h, mems), s = jax.lax.scan(step, (x, mems), None, length=T)
    return s.sum(), h


def run_v2(x, mems):
    def step(carry, _):
        h, mems = carry  # h: int8 spikes, mems: int8
        new = []
        for i in range(L):
            y = conv_i8(h, wsi[i], scales[i])
            mem2 = mems[i].astype(jnp.bfloat16) * (MEMS * jnp.bfloat16(0.9)) + y
            spk = mem2 > jnp.bfloat16(1.0)
            h = spk.astype(jnp.int8)
            mem_out = jnp.where(spk, jnp.bfloat16(0), mem2)
            new.append(jnp.clip(jnp.round(mem_out / MEMS), -127, 127).astype(jnp.int8))
        return (h, tuple(new)), h.astype(jnp.int32).sum()
    (h, mems), s = jax.lax.scan(step, (x, mems), None, length=T)
    return s.sum(), h


# v3: 1x3 conv formulation (kernel [1,3,Cin,3C]), int8 feature/kernel, int32 acc
wconv = [w.reshape(3, C, 3 * C)[None] for w in wsi]  # [1, dx, ci, (dy,co)]


def run_v3(x, mems):
    dn = jax.lax.conv_dimension_numbers((B, H, W, C), (1, 3, C, 3 * C),
                                        ("NHWC", "HWIO", "NHWC"))
    def step(carry, _):
        h, mems = carry
        new = []
        for i in range(L):
            Z = jax.lax.conv_general_dilated(
                h, wconv[i], (1, 1), ((0, 0), (1, 1)),
                dimension_numbers=dn, preferred_element_type=jnp.int32,
            ).astype(jnp.bfloat16) * scales[i]
            y = epilogue(Z)
            mem2 = mems[i] * jnp.bfloat16(0.9) + y
            spk = mem2 > jnp.bfloat16(1.0)
            h = spk.astype(jnp.int8)
            new.append(jnp.where(spk, jnp.bfloat16(0), mem2))
        return (h, tuple(new)), h.astype(jnp.int32).sum()
    (h, mems), s = jax.lax.scan(step, (x, mems), None, length=T)
    return s.sum(), h


def run_v4(x, mems):
    def step(carry, _):
        h, mems = carry  # h: int4 spikes
        new = []
        for i in range(L):
            xp = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (0, 0)))
            cols = jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)
            Z = jax.lax.dot_general(
                cols.reshape(-1, 3 * C), wsi[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * scales[i]
            y = epilogue(Z)
            mem2 = mems[i] * jnp.bfloat16(0.9) + y
            spk = mem2 > jnp.bfloat16(1.0)
            h = spk.astype(jnp.int4)
            new.append(jnp.where(spk, jnp.bfloat16(0), mem2))
        return (h, tuple(new)), h.astype(jnp.int32).sum()
    (h, mems), s = jax.lax.scan(step, (x, mems), None, length=T)
    return s.sum(), h


if __name__ == "__main__":
    which = sys.argv[1:] or ["v1", "v2", "v3", "v4"]
    if "v1" in which:
        cs, t = timeit(jax.jit(run_v1), x0_i8, mems_bf)
        report("v1 i8-spk carries, bf16 mem ", cs, t)
    if "v2" in which:
        cs, t = timeit(jax.jit(run_v2), x0_i8, mems_i8)
        report("v2 i8-spk + i8-mem          ", cs, t)
    if "v3" in which:
        cs, t = timeit(jax.jit(run_v3), x0_i8, mems_bf)
        report("v3 conv1x3 int8             ", cs, t)
    if "v4" in which:
        try:
            cs, t = timeit(jax.jit(run_v4), x0_i8.astype(jnp.int4), mems_bf)
            report("v4 i4-cols                  ", cs, t)
        except Exception as e:
            print(f"v4 i4-cols: FAILED ({type(e).__name__}: {str(e)[:200]})", flush=True)
