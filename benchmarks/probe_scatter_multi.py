"""Multi-channel scatter probe: the EventWarping loss's dominant term.

The train-step profile (profile_train.py, round 7) shows 8 scatter-add
fusions of ~2.5 ms each (4 IWE images x fw/bw directions, all sharing the
direction's indices) plus their ~2.1 ms VJP gathers — 68% of the 54 ms
device step. TPU scatters are index-bound: sorting/serializing duplicate
indices dominates, not the payload. Hypothesis: ONE scatter carrying a
[., 4]-channel update window costs ~the same as one single-channel
scatter, i.e. ~4x less than four separate ones.

Measures, at the loss's real scale ([B=8, M=4*P*N=40k] into 128^2):
  sep4  : four at[].add scatters with shared idx (shipped formulation)
  multi : one at[].add of [B, M, 4] into [B, HW, 4]
  grad4 / gradm : the same under jax.grad (the VJP gathers)

Run: python benchmarks/probe_scatter_multi.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

B, H, W = 8, 128, 128
M = 4 * 10 * 1000  # 4 corners x P x N
HW = H * W

key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (B, M), 0, HW, dtype=jnp.int32)
w = jax.random.uniform(jax.random.PRNGKey(1), (B, M, 4), jnp.float32)
rows = jnp.arange(B)[:, None]


def sep4(idx, w):
    outs = []
    for c in range(4):
        img = jnp.zeros((B, HW), jnp.float32)
        outs.append(img.at[rows, idx].add(w[..., c]))
    o = jnp.stack(outs, -1)
    return (o / (o.sum(-1, keepdims=True) + 1e-9)).sum()


def multi(idx, w):
    img = jnp.zeros((B, HW, 4), jnp.float32)
    o = img.at[rows, idx].add(w)
    return (o / (o.sum(-1, keepdims=True) + 1e-9)).sum()


K = 32  # ops per dispatch: amortize the ~30 ms dispatch+fetch roundtrip


def bench(name, fn, grad=False):
    g = jax.grad(fn, argnums=1) if grad else fn

    def scan(idx, w):
        def body(c, k):
            # vary the weights per step so nothing hoists out of the loop
            out = g(idx, w * (1.0 + 1e-6 * k))
            import jax.tree_util as jtu

            s = jtu.tree_reduce(
                lambda a, x: a + jnp.asarray(x).sum(), out, 0.0
            )
            return c + s, None

        tot, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
        return tot

    f = jax.jit(scan)
    float(f(idx, w))
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        float(f(idx, w))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:6s}: {best / K * 1e3:7.3f} ms/op ({K}/dispatch)", flush=True)


def exact():
    a = jax.jit(sep4)(idx, w)
    b = jax.jit(multi)(idx, w)
    print("values equal:", abs(float(a) - float(b)) < 1e-3,
          float(a), float(b), flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["exact", "sep4", "multi", "grad4", "gradm"]
    if "exact" in which:
        exact()
    if "sep4" in which:
        bench("sep4", sep4)
    if "multi" in which:
        bench("multi", multi)
    if "grad4" in which:
        bench("grad4", sep4, grad=True)
    if "gradm" in which:
        bench("gradm", multi, grad=True)


# --- 2x2-window scatter: one entry per EVENT (4x fewer indices) ---------
# Each event writes its 4 bilinear corners as one [2, 2, C] update window
# anchored at (floor(y), floor(x)). The image carries a 1-px border so
# edge windows stay in-bounds (corner weights at the border are zero
# anyway, matching get_interpolation's OOB masking).
ME = M // 4  # events (the 4x was the corner expansion)
yx = jax.random.uniform(jax.random.PRNGKey(2), (B, ME, 2), jnp.float32)
yx = yx * jnp.asarray([H - 1.0, W - 1.0])
wev = jax.random.uniform(jax.random.PRNGKey(3), (B, ME, 4), jnp.float32)


def corners(yx):
    f = jnp.floor(yx)
    fy, fx = (yx - f)[..., 0], (yx - f)[..., 1]
    wy = jnp.stack([1.0 - fy, fy], -1)            # [B, ME, 2]
    wx = jnp.stack([1.0 - fx, fx], -1)
    return f.astype(jnp.int32), wy[..., :, None] * wx[..., None, :]


def win22(yx, wev):
    anchor, w22 = corners(yx)                      # [B,ME,2] / [B,ME,2,2]
    upd = (w22[..., None] * wev[:, :, None, None, :]).reshape(B * ME, 2, 2, 4)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, ME)).reshape(-1, 1)
    sidx = jnp.concatenate([bidx, anchor.reshape(-1, 2)], axis=1)  # [G, 3]
    img = jnp.zeros((B, H + 1, W + 1, 4), jnp.float32)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1, 2),
    )
    img = jax.lax.scatter_add(img, sidx, upd, dnums)
    o = img[:, :H, :W].reshape(B, HW, 4)
    return (o / (o.sum(-1, keepdims=True) + 1e-9)).sum()


def multi_ev(yx, wev):
    """The shipped formulation on the SAME inputs: 4 corner entries/event."""
    anchor, w22 = corners(yx)
    idx4 = jnp.concatenate([
        (anchor[..., 0] + dy) * (W) + (anchor[..., 1] + dx)
        for dy in (0, 1) for dx in (0, 1)
    ], axis=1)
    idx4 = jnp.clip(idx4, 0, HW - 1)
    w4 = jnp.concatenate([
        w22[..., dy, dx, None] * wev for dy in (0, 1) for dx in (0, 1)
    ], axis=1)                                      # [B, 4ME, 4]
    img = jnp.zeros((B, HW, 4), jnp.float32)
    o = img.at[jnp.arange(B)[:, None], idx4].add(w4)
    return (o / (o.sum(-1, keepdims=True) + 1e-9)).sum()


def bench2(name, fn, grad=False):
    g = jax.grad(fn, argnums=1) if grad else fn

    def scan(yx, wev):
        def body(c, k):
            out = g(yx, wev * (1.0 + 1e-6 * k))
            import jax.tree_util as jtu

            s = jtu.tree_reduce(lambda a, x: a + jnp.asarray(x).sum(), out, 0.0)
            return c + s, None

        tot, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
        return tot

    f = jax.jit(scan)
    float(f(yx, wev))
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        float(f(yx, wev))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:8s}: {best / K * 1e3:7.3f} ms/op ({K}/dispatch)", flush=True)


if "win22" in sys.argv:
    a = float(jax.jit(multi_ev)(yx, wev))
    b = float(jax.jit(win22)(yx, wev))
    print("win22 vs multi_ev values:", a, b, "equal:", abs(a - b) < 1e-2,
          flush=True)
    bench2("multi_ev", multi_ev)
    bench2("win22", win22)
    bench2("gradm_ev", multi_ev, grad=True)
    bench2("gradw22", win22, grad=True)


# --- sorted segment-sum (SURVEY §7 hard-parts prescription) --------------
# Sort entries by pixel index per batch row, then segment_sum with
# indices_are_sorted=True: if XLA's scatter lowering (which sorts
# internally — the train profile shows sort ops) leaves performance on
# the table, an explicit sort+segsum should beat the multi-channel
# scatter. VJP: gather at segment_ids + an inverse permutation.
def sorted_seg(idx, w):
    def one(idx_b, w_b):
        order = jnp.argsort(idx_b)
        seg = jax.ops.segment_sum(
            w_b[order], idx_b[order], num_segments=HW,
            indices_are_sorted=True,
        )
        return seg

    o = jax.vmap(one)(idx, w)  # [B, HW, 4]
    return (o / (o.sum(-1, keepdims=True) + 1e-9)).sum()


if "sorted" in sys.argv:
    a = float(jax.jit(multi)(idx, w))
    b = float(jax.jit(sorted_seg)(idx, w))
    print("sorted_seg vs multi values:", a, b, "equal:", abs(a - b) < 1e-2,
          flush=True)
    bench("multi", multi)
    bench("sorted", sorted_seg)
    bench("gradm", multi, grad=True)
    bench("grads", sorted_seg, grad=True)
