"""Probe: dy shift-add epilogue as a diagonal grouped conv.

The elementwise epilogue reads Z at 3 row-shifted offsets (plus the pad
copy) — if XLA doesn't reuse rows across those reads, Z traffic is ~3x its
bytes. A conv with window (3,1) handles the row halo inside the emitter's
VMEM pipeline, reading Z ~once. The diagonal trick: pack the GEMM's output
columns co-major ([C, 3] per channel instead of [(dy, co)]), then a
feature_group_count=C conv with kernel [3,1,3,1] = identity on (window
row == dy slot) computes exactly y[h] = sum_dy Z[h+dy-1, co, dy].

  e1 elementwise : current shift-add (baseline, same as deploy engine)
  e2 conv-diag   : grouped diagonal conv epilogue
  e3 chain-conv  : full 9-layer chain with e2 epilogue (vs v1's 1665)
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


# diagonal kernel for the grouped conv: [3, 1, in_per_group=3, out_total=C]
# (out features must be a multiple of feature_group_count; out_per_group=1,
# group g's kernel is slice [..., g] — same diagonal for every group)
DIAG = jnp.asarray(
    np.broadcast_to(np.eye(3, dtype=np.float32)[:, None, :, None], (3, 1, 3, C)),
    jnp.bfloat16,
)
DN = jax.lax.conv_dimension_numbers((B, H, W, 3 * C), (3, 1, 3, C),
                                    ("NHWC", "HWIO", "NHWC"))


def ep_elem(Z):  # Z columns (dy, co)
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return (
        Zp[:, 0:H, :, 0:C]
        + Zp[:, 1 : 1 + H, :, C : 2 * C]
        + Zp[:, 2 : 2 + H, :, 2 * C : 3 * C]
    )


def ep_conv(Zc):  # Zc columns (co, dy) — co-major
    return jax.lax.conv_general_dilated(
        Zc, DIAG, (1, 1), ((1, 1), (0, 0)), dimension_numbers=DN,
        feature_group_count=C,
    )


def scan_ep(ep, cols_order):
    def run(Z):
        def step(z, _):
            y = ep(z)
            if cols_order == "co_major":  # channel triple = same y channel
                z2 = jnp.repeat(y, 3, axis=-1) * jnp.bfloat16(0.5)
            else:
                z2 = jnp.concatenate([y, y, y], axis=-1) * jnp.bfloat16(0.5)
            return z2, y.sum()
        z, s = jax.lax.scan(step, Z, None, length=T)
        return s.sum()
    return run


# --- e3: full chain, conv epilogue; weights packed co-major
ws96 = [
    (jax.random.normal(jax.random.fold_in(key, i), (9 * C, C), jnp.float32) * 0.05)
    .reshape(3, 3, C, C).transpose(1, 2, 0, 3).reshape(3 * C, 3 * C)
    for i in range(L)
]
wsi = [jnp.clip(jnp.round(w * 127 / jnp.max(jnp.abs(w))), -127, 127).astype(jnp.int8)
       for w in ws96]
# reorder columns (dy, co) -> (co, dy)
perm = np.arange(3 * C).reshape(3, C).T.reshape(-1)
wsi_co = [w[:, perm] for w in wsi]
scales = [jnp.bfloat16(float(jnp.max(jnp.abs(w))) / 127.0) for w in ws96]
x0_i8 = (jax.random.uniform(key, (B, H, W, C), jnp.float32) < 0.15).astype(jnp.int8)
mems_bf = tuple(jnp.zeros((B, H, W, C), jnp.bfloat16) for _ in range(L))


def conv_i8_co(x_i8, w_i8, s):
    xp = jnp.pad(x_i8, ((0, 0), (0, 0), (1, 1), (0, 0)))
    cols = jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)
    Zc = jax.lax.dot_general(
        cols.reshape(-1, 3 * C), w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * s
    return ep_conv(Zc)


def run_chain(x, mems):
    def step(carry, _):
        h, mems = carry
        new = []
        for i in range(L):
            y = conv_i8_co(h, wsi_co[i], scales[i])
            mem2 = mems[i] * jnp.bfloat16(0.9) + y
            spk = mem2 > jnp.bfloat16(1.0)
            h = spk.astype(jnp.int8)
            new.append(jnp.where(spk, jnp.bfloat16(0), mem2))
        return (h, tuple(new)), h.astype(jnp.int32).sum()
    (h, mems2), s = jax.lax.scan(step, (x, mems), None, length=T)
    return s.sum(), h


if __name__ == "__main__":
    # correctness: both epilogues equal on random Z (small-H local variant
    # of ep_elem; ep_elem itself hardcodes H for the timed path)
    h16 = 16
    Z = jax.random.normal(key, (2, h16, 16, 3 * C), jnp.bfloat16)
    Zc = Z.reshape(2, h16, 16, 3, C).transpose(0, 1, 2, 4, 3).reshape(
        2, h16, 16, 3 * C)
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0)))
    a = np.asarray((Zp[:, 0:h16, :, 0:C] + Zp[:, 1:1 + h16, :, C:2 * C]
                    + Zp[:, 2:2 + h16, :, 2 * C:3 * C]).astype(jnp.float32))
    dn16 = jax.lax.conv_dimension_numbers((2, h16, 16, 3 * C), (3, 1, 3, C),
                                          ("NHWC", "HWIO", "NHWC"))
    b = np.asarray(jax.lax.conv_general_dilated(
        Zc, DIAG, (1, 1), ((1, 1), (0, 0)), dimension_numbers=dn16,
        feature_group_count=C).astype(jnp.float32))
    err = np.max(np.abs(a - b))
    print(f"epilogue equivalence: max|diff| = {err:.2e}", flush=True)
    assert err < 0.1  # bf16 accumulation-order rounding

    which = sys.argv[1:] or ["e1", "e2", "e3"]
    Z0 = jax.random.normal(key, (B, H, W, 3 * C), jnp.bfloat16)
    zb = B * H * W * 3 * C * 2
    if "e1" in which:
        cs, t = timeit(jax.jit(scan_ep(ep_elem, "dy_major")), Z0)
        print(f"e1 elementwise: compile {cs:.0f}s, {t/T*1e3:.2f} ms/iter "
              f"({t/T*740e9/zb:.2f}x Z-bytes at 740GB/s)", flush=True)
    if "e2" in which:
        cs, t = timeit(jax.jit(scan_ep(ep_conv, "co_major")), Z0)
        print(f"e2 conv-diag  : compile {cs:.0f}s, {t/T*1e3:.2f} ms/iter "
              f"({t/T*740e9/zb:.2f}x Z-bytes at 740GB/s)", flush=True)
    if "e3" in which:
        cs, t = timeit(jax.jit(run_chain), x0_i8, mems_bf)
        print(f"e3 chain-conv-ep: compile {cs:.0f}s, {t/T*1e3:.2f} ms/step -> "
              f"{T*B/t:.0f} win/s-equiv (v1 baseline 1665)", flush=True)
