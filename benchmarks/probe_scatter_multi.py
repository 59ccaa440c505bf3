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
