"""Dual-unit cols formulations in the round-6 regime (B=2, bf16 membranes).

The bf16/B=2 profile (profile_bench.py, round 7) shows the two recurrent
(dual) units' GEMMs at ~50.8 us/step vs ~10.5 us for feedforward units —
4.8x the time for 2x the FLOPs — plus ~41% of the step in cols-assembly
fusions. Hypothesis: the ff path's pad/slice cols fuse INTO the conv input,
while the dual 6-slice concat from TWO arrays materializes a 192-wide s8
buffer the conv then re-reads from HBM.

  var0  control     : shipped engine (cols_dx_dual 6-slice concat)
  varI  interleave  : hb = concat([h, spk], -1) [B,H,W,2C] (one cheap
                      channel concat), then the STANDARD cols_dx pattern
                      [B,H,W,3*2C] with kernel rows permuted at prepare
                      time — identical int32 accumulation, bit-exact,
                      but the cols structure matches the ff path XLA
                      already fuses.
  varS  split bf16  : two K=3C dots + fused bf16 add (round-5 var4,
                      re-tested in the new regime — it lost at B=8/mixed).

Run: python benchmarks/bench_dual_interleave.py [var0 varI varS exact]
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from evflow.deploy import Int8DeployEngine
from evflow.ops.dypack import cols_dx, dy_epilogue
from evflow.ops.lif import LIFState, leaky_step
from evflow.registry import build_model

B, H, W, T = 2, 256, 256, 2048
C = 32

cfg = {
    "name": "LIFFireNet", "num_bins": 2, "base_num_channels": C,
    "kernel_size": 3, "encoding": "cnt",
    "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
}
model = build_model(cfg)
states0 = model.init_states(B, H, W)
key = jax.random.PRNGKey(0)
variables = model.init(key, None, jnp.zeros((B, H, W, 2), jnp.float32), states0)
engine = Int8DeployEngine(model, variables, mem_dtype="bfloat16")
window = jax.random.poisson(key, 0.05, (B, H, W, 2)).astype(jnp.float32)


def interleave_rows(w, C):
    """[6C, 3C] dual-packed rows [a(dx,ci); b(dx,ci)] -> [(dx, a-ci|b-ci)]
    so the dot consumes cols_dx(concat([a, b], -1)) directly."""
    idx = np.empty(6 * C, np.int32)
    for dx in range(3):
        idx[dx * 2 * C : dx * 2 * C + C] = np.arange(dx * C, dx * C + C)
        idx[dx * 2 * C + C : (dx + 1) * 2 * C] = np.arange(
            3 * C + dx * C, 3 * C + dx * C + C
        )
    return w[idx]


PARAMS_I = jax.tree.map(lambda x: x, engine.params)  # shallow-ish copy
PARAMS_I = dict(PARAMS_I)
PARAMS_I["units"] = [dict(u) for u in engine.params["units"]]
for i, rec in enumerate(engine.unit_recurrent):
    if rec:
        PARAMS_I["units"][i]["w"] = jnp.asarray(
            interleave_rows(np.asarray(engine.params["units"][i]["w"]), C)
        )


def apply_variant(params, x, states, mode):
    xi = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)
    h = xi
    new_states = []
    for i, unit in enumerate(params["units"]):
        mem, prev_spk = states[i]
        if engine.unit_recurrent[i] and mode == "interleave":
            hb = jnp.concatenate([h, prev_spk], axis=-1)
            cols = cols_dx(hb)
            Zi = jax.lax.dot_general(
                cols.reshape(-1, cols.shape[-1]), unit["w"],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
            )
            Z = Zi.astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * unit["col_scale"]
        elif engine.unit_recurrent[i] and mode == "split":
            K = unit["w"].shape[0] // 2
            Za = jax.lax.dot_general(
                cols_dx(h).reshape(-1, K), unit["w"][:K],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
            ).astype(jnp.bfloat16) * unit["col_scale"]
            Zb = jax.lax.dot_general(
                cols_dx(prev_spk).reshape(-1, K), unit["w"][K:],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
            ).astype(jnp.bfloat16) * unit["col_scale"]
            Z = (Za + Zb).reshape(B, H, W, 3 * C)
        else:
            if engine.unit_recurrent[i]:
                from evflow.ops.dypack import cols_dx_dual

                cols = cols_dx_dual(h, prev_spk)
            else:
                cols = cols_dx(h)
            Zi = jax.lax.dot_general(
                cols.reshape(-1, cols.shape[-1]), unit["w"],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
            )
            Z = Zi.astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * unit["col_scale"]
        y = dy_epilogue(Z, H, C) + unit["bias"]
        spk, mem_out = leaky_step(
            y, mem, unit["beta"], unit["theta"],
            reset="zero" if engine.hard_reset else "subtract", alpha=engine.alpha,
        )
        h = spk.astype(jnp.int8)
        new_states.append(LIFState(mem_out, h if engine.unit_recurrent[i] else None))
    hs = h.astype(jnp.bfloat16)
    flow = jnp.einsum("bhwc,co->bhwo", hs, params["pred_kernel"][0, 0])
    if params["pred_bias"] is not None:
        flow = flow + params["pred_bias"]
    return jnp.tanh(flow).astype(jnp.float32), tuple(new_states)


def bench(name, params, mode, iters=8):
    def run(params, window, states):
        def step(st, _):
            flow, new_st = apply_variant(params, window, st, mode)
            return new_st, flow.sum()

        final, fsum = jax.lax.scan(step, states, None, length=T)
        return fsum.sum(), final

    run_j = jax.jit(run, donate_argnums=(2,))
    est = engine.init_states(B, H, W)
    t0 = time.time()
    s, st = run_j(params, window, est)
    float(s)
    cs = time.time() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        s, st = run_j(params, window, st)
        float(s)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: compile {cs:.0f}s, {best/T*1e3:.3f} ms/win -> "
          f"{T*B/best:.0f} win/s", flush=True)


def exactness():
    """varI's int32 sums are var0's, reordered — so every membrane and
    spike must be BIT-identical. The pred head (bf16 einsum + tanh) is
    only allclose: XLA picks a different f32 accumulation order per
    program, which is rounding, not formulation (verified on CPU: states
    exactly equal, flow |d| ~ 1e-9; on TPU the bf16 einsum amplifies the
    reassociation to ~1e-2)."""
    def roll(params, mode, steps=6):
        st = engine.init_states(B, H, W)
        outs = []
        for _ in range(steps):
            flow, st = apply_variant(params, window, st, mode)
            outs.append(flow)
        mems = jnp.stack([s.mem.astype(jnp.float32) for s in st])
        spks = jnp.stack([s.spk for s in st if s.spk is not None])
        return jnp.stack(outs), mems, spks

    f0, m0, s0 = jax.jit(lambda: roll(engine.params, "dual"))()
    fi, mi, si = jax.jit(lambda: roll(PARAMS_I, "interleave"))()
    state_same = np.array_equal(np.asarray(m0), np.asarray(mi)) and np.array_equal(
        np.asarray(s0), np.asarray(si)
    )
    fd = np.max(np.abs(np.asarray(f0) - np.asarray(fi)))
    print(f"exactness var0 vs varI over 6 steps: states "
          f"{'BIT-IDENTICAL' if state_same else 'MISMATCH'}, "
          f"pred-head max |d|={fd:g} (bf16 einsum reassociation)", flush=True)
    assert state_same and fd < 0.1


if __name__ == "__main__":
    which = sys.argv[1:] or ["exact", "var0", "varI", "varS"]
    if "exact" in which:
        exactness()
    if "var0" in which:
        bench("var0 control (dual cols)", engine.params, "dual")
    if "varI" in which:
        bench("varI interleaved dual   ", PARAMS_I, "interleave")
    if "varS" in which:
        bench("varS split bf16 dual    ", engine.params, "split")
