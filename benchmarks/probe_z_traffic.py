"""Probe: where do the deploy step's bytes actually go?

(a) XLA cost_analysis of the v1 deploy chain step (same program as
    probe_int8_deploy.py v1 — compilation-cache hit) -> bytes accessed.
(b) Micro: the dy shift-add epilogue alone over Z [8,256,256,96] bf16 —
    does the 3-shifted-read pattern cost 1x or 3x of Z bytes at the
    measured ~740 GB/s elementwise stream rate?
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


def epilogue(Z):
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return (
        Zp[:, 0:H, :, 0:C]
        + Zp[:, 1 : 1 + H, :, C : 2 * C]
        + Zp[:, 2 : 2 + H, :, 2 * C : 3 * C]
    )


def conv_i8(x_i8, w_i8, s):
    xp = jnp.pad(x_i8, ((0, 0), (0, 0), (1, 1), (0, 0)))
    cols = jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)
    Z = jax.lax.dot_general(
        cols.reshape(-1, 3 * C), w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * s
    return epilogue(Z)


def run_v1(x, mems):
    def step(carry, _):
        h, mems = carry
        new = []
        for i in range(L):
            y = conv_i8(h, wsi[i], scales[i])
            mem2 = mems[i] * jnp.bfloat16(0.9) + y
            spk = mem2 > jnp.bfloat16(1.0)
            h = spk.astype(jnp.int8)
            new.append(jnp.where(spk, jnp.bfloat16(0), mem2))
        return (h, tuple(new)), h.astype(jnp.int32).sum()
    (h, mems2), s = jax.lax.scan(step, (x, mems), None, length=T)
    return s.sum(), h


if __name__ == "__main__":
    c = jax.jit(run_v1).lower(x0_i8, mems_bf).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    ba = ca.get("bytes accessed", None)
    print(f"v1 chain cost_analysis: bytes accessed "
          f"{(ba or 0)/1e9:.2f} GB total, {(ba or 0)/T/1e9:.3f} GB/step; "
          f"flops {ca.get('flops', 0)/1e12:.2f} T", flush=True)
    for k, v in sorted(ca.items()):
        if isinstance(v, (int, float)) and v > 1e6:
            print(f"  {k}: {v:.3e}", flush=True)

    # (b) epilogue micro: scan the shift-add alone
    Z0 = jax.random.normal(key, (B, H, W, 3 * C), jnp.bfloat16)

    @jax.jit
    def ep_only(Z):
        def step(z, _):
            y = epilogue(z)
            z2 = jnp.concatenate([y, y, y], axis=-1) * jnp.bfloat16(0.5)
            return z2, y.sum()
        z, s = jax.lax.scan(step, Z, None, length=T)
        return s.sum()

    t0 = time.time(); _ = float(ep_only(Z0)); print(f"ep compile {time.time()-t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); _ = float(ep_only(Z0))
        best = min(best, time.perf_counter() - t0)
    zb = B * H * W * 3 * C * 2
    # per step: read Z (1x or 3x?) + write y-concat (zb) -> infer multiplicity
    per = best / T
    print(f"epilogue micro: {per*1e3:.2f} ms/iter; at 740 GB/s that is "
          f"{per*740e9/zb:.2f} x Z-bytes moved (2.0 = 1x read + 1x write)",
          flush=True)
