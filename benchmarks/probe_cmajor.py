"""Probe: channel-major flat-M formulation of the deploy chain.

probe_z_traffic.py showed the dy shift-add epilogue moves 14x Z-bytes of
time (1.91 ms for a 100 MB Z): row-shifted reads that also slice channels
out of the 3C minor dim leave 32/128 lanes live. Channel-major fixes the
pattern: every image tensor is [rows, M] with M = B*H*W flat in the minor
dim, so
  * dx shifts (cols build)   = flat shifts by +-1  (contiguous, full-lane)
  * dy shifts (epilogue)     = flat shifts by +-W  (contiguous, full-lane)
  * image edges              = precomputed 0/1 masks, broadcast elementwise
  * the GEMM becomes W'^T [3C,3C] @ cols [3C, M] (weights stationary,
    M in lanes on both operands)
LIF stays elementwise on [C, M]. Exactness is preserved (integer GEMMs,
masks are exact zeros at image borders).

  c1 cmajor, bf16 mem + masks     (vs row-major v1: 1665 win/s-equiv)
  c2 cmajor + int8 mem            (vs v2: 1860)
  c3 cmajor, no masks             (upper bound; edge-wrap inexact)
  e4 cmajor epilogue micro        (vs row-major e1: 1.91 ms/iter)
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, W, C = 8, 256, 256, 32
M = B * H * W
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


# --- edge masks (flat-M): dx masks kill w-wrap, dy masks kill h-wrap ---
w_idx = np.arange(M) % W
h_idx = (np.arange(M) // W) % H
mask_dxm = jnp.asarray((w_idx != 0).astype(np.int8))[None, :]       # reads m-1
mask_dxp = jnp.asarray((w_idx != W - 1).astype(np.int8))[None, :]   # reads m+1
mask_dym = jnp.asarray((h_idx != 0).astype(np.float32), jnp.bfloat16)[None, :]
mask_dyp = jnp.asarray((h_idx != H - 1).astype(np.float32), jnp.bfloat16)[None, :]

# weights: [3C rows (dy,co)] x [3C cols (dx,ci)] — transposed dypack
wts = [
    (jax.random.normal(jax.random.fold_in(key, i), (3 * C, 3 * C), jnp.float32) * 0.05)
    for i in range(L)
]
wti = [jnp.clip(jnp.round(w * 127 / jnp.max(jnp.abs(w))), -127, 127).astype(jnp.int8)
       for w in wts]
scales = [jnp.bfloat16(float(jnp.max(jnp.abs(w))) / 127.0) for w in wts]

x0 = (jax.random.uniform(key, (C, M), jnp.float32) < 0.15).astype(jnp.int8)
mems_bf = tuple(jnp.zeros((C, M), jnp.bfloat16) for _ in range(L))
mems_i8 = tuple(jnp.zeros((C, M), jnp.int8) for _ in range(L))
MEMS = jnp.bfloat16(0.05)


def cols_cm(h, masks):
    """[C, M] int8 spikes -> [3C, M] dx-shifted cols."""
    hp = jnp.pad(h, ((0, 0), (1, 1)))
    left = hp[:, 0:M]     # reads m-1
    right = hp[:, 2:M + 2]  # reads m+1
    if masks:
        left = left * mask_dxm
        right = right * mask_dxp
    return jnp.concatenate([left, h, right], axis=0)


def ep_cm(Z, masks):
    """[3C, M] Z (dy-major rows) -> [C, M] via +-W flat shifts."""
    Zp = jnp.pad(Z, ((0, 0), (W, W)))
    up = Zp[0 * C:1 * C, 0:M]          # reads m-W
    mid = Z[1 * C:2 * C, :]
    dn = Zp[2 * C:3 * C, 2 * W:M + 2 * W]  # reads m+W
    if masks:
        up = up * mask_dym
        dn = dn * mask_dyp
    return up + mid + dn


def conv_cm(h, w_i8, s, masks):
    cols = cols_cm(h, masks)
    Z = jax.lax.dot_general(
        w_i8, cols, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
    ).astype(jnp.bfloat16) * s
    return ep_cm(Z, masks)


def make_chain(int8_mem, masks):
    def run(x, mems):
        def step(carry, _):
            h, mems = carry
            new = []
            for i in range(L):
                y = conv_cm(h, wti[i], scales[i], masks)
                if int8_mem:
                    mem2 = mems[i].astype(jnp.bfloat16) * (MEMS * jnp.bfloat16(0.9)) + y
                else:
                    mem2 = mems[i] * jnp.bfloat16(0.9) + y
                spk = mem2 > jnp.bfloat16(1.0)
                h = spk.astype(jnp.int8)
                mem_out = jnp.where(spk, jnp.bfloat16(0), mem2)
                if int8_mem:
                    mem_out = jnp.clip(jnp.round(mem_out / MEMS), -127, 127).astype(jnp.int8)
                new.append(mem_out)
            return (h, tuple(new)), h.astype(jnp.int32).sum()
        (h, mems2), s = jax.lax.scan(step, (x, mems), None, length=T)
        return s.sum(), h
    return run


if __name__ == "__main__":
    which = sys.argv[1:] or ["c1", "c2", "c3", "e4"]
    if "c1" in which:
        cs, t = timeit(jax.jit(make_chain(False, True)), x0, mems_bf)
        print(f"c1 cmajor bf16-mem+masks: compile {cs:.0f}s, {t/T*1e3:.2f} ms/step"
              f" -> {T*B/t:.0f} win/s-equiv (row-major v1: 1665)", flush=True)
    if "c2" in which:
        cs, t = timeit(jax.jit(make_chain(True, True)), x0, mems_i8)
        print(f"c2 cmajor int8-mem+masks: compile {cs:.0f}s, {t/T*1e3:.2f} ms/step"
              f" -> {T*B/t:.0f} win/s-equiv (row-major v2: 1860)", flush=True)
    if "c3" in which:
        cs, t = timeit(jax.jit(make_chain(False, False)), x0, mems_bf)
        print(f"c3 cmajor no-masks      : compile {cs:.0f}s, {t/T*1e3:.2f} ms/step"
              f" -> {T*B/t:.0f} win/s-equiv (upper bound)", flush=True)
    if "e4" in which:
        Z0 = jax.random.normal(key, (3 * C, M), jnp.bfloat16)

        @jax.jit
        def ep_only(Z):
            def step(z, _):
                y = ep_cm(z, True)
                z2 = jnp.concatenate([y, y, y], axis=0) * jnp.bfloat16(0.5)
                return z2, y.sum()
            z, s = jax.lax.scan(step, Z, None, length=T)
            return s.sum()

        cs, t = timeit(ep_only, Z0)
        zb = 3 * C * M * 2
        print(f"e4 cmajor epilogue micro: compile {cs:.0f}s, {t/T*1e3:.2f} ms/iter "
              f"({t/T*740e9/zb:.2f}x Z-bytes at 740GB/s; row-major: 1.91 ms = 14x)",
              flush=True)
