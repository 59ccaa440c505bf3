"""Single-chip wavefront: batch the unit chain across in-flight windows.

The chain is serial within one window, but across a stream it admits the
same wavefront the multi-chip pipeline uses (evflow/parallel/pipeline.py):
at step s, unit i processes window s - i. All 7 units are then independent
WITHIN a step, so same-shape units batch into single batched ops:

  - 4 ff C=32 units  -> ONE [4, BHW, 3C] @ [4, 3C, 3C] batched int8 dot
  - 2 dual units     -> ONE [2, BHW, 6C] @ [2, 6C, 3C] batched int8 dot
                        (interleaved-row layout: cols_dx(concat(h, spk)))
  - head (K=6)       -> as-is

cols assembly, dy-epilogue and LIF all run on stacked [U,B,H,W,.] tensors
(one fusion each instead of 7). Per-step FLOPs and math are identical to
the sequential engine (the batched dot IS the same dots); only op count
and scheduling change. Fill costs 6 warm-up steps per stream — noise at
the bench T.

Hypothesis: if the step is partly bound by per-op fixed overhead and
scheduler fragmentation (the dual GEMMs profile at 4.8x the ff time for
2x the FLOPs), fusing 30+ ops/step into ~10 larger ones pays; if it is
pure HBM traffic, this is neutral.

Run: python benchmarks/probe_wavefront.py [control wave]
"""
import os
import sys; sys.path.insert(0, "/root/repo")
import time

import jax

if os.environ.get("EVCPU"):  # CPU smoke mode (shape/compile check)
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from evflow.deploy import Int8DeployEngine
from evflow.ops.dypack import cols_dx, dy_epilogue
from evflow.ops.lif import leaky_step
from evflow.registry import build_model

B = int(os.environ.get("EVB", 2))
H = W = int(os.environ.get("EVHW", 256))
T = int(os.environ.get("EVT", 2048))
C = 32

cfg = {
    "name": "LIFFireNet", "num_bins": 2, "base_num_channels": C,
    "kernel_size": 3, "encoding": "cnt",
    "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
}
model = build_model(cfg)
key = jax.random.PRNGKey(0)
variables = model.init(
    key, None, jnp.zeros((B, H, W, 2), jnp.float32), model.init_states(B, H, W)
)
engine = Int8DeployEngine(model, variables, mem_dtype="bfloat16")
window = jax.random.poisson(key, 0.05, (B, H, W, 2)).astype(jnp.float32)

REC = list(engine.unit_recurrent)          # [F, T, F, F, T, F, F]
FF_IDX = [i for i in range(1, 7) if not REC[i]]
DUAL_IDX = [i for i in range(7) if REC[i]]
assert not REC[0], "head must be feedforward"


def interleave_rows(w, C):
    idx = np.empty(6 * C, np.int32)
    for dx in range(3):
        idx[dx * 2 * C : dx * 2 * C + C] = np.arange(dx * C, dx * C + C)
        idx[dx * 2 * C + C : (dx + 1) * 2 * C] = np.arange(
            3 * C + dx * C, 3 * C + dx * C + C
        )
    return w[idx]


U = engine.params["units"]
W_FF = jnp.stack([U[i]["w"] for i in FF_IDX])                       # [4,3C,3C]
S_FF = jnp.stack([jnp.broadcast_to(U[i]["col_scale"], (3 * C,)) for i in FF_IDX])
B_FF = jnp.stack([jnp.broadcast_to(U[i]["bias"], (C,)) for i in FF_IDX])
BETA_FF = jnp.stack([jnp.broadcast_to(U[i]["beta"], (C,)) for i in FF_IDX])
TH_FF = jnp.stack([jnp.broadcast_to(U[i]["theta"], (C,)) for i in FF_IDX])
W_D = jnp.stack([
    jnp.asarray(interleave_rows(np.asarray(U[i]["w"]), C)) for i in DUAL_IDX
])                                                                  # [2,6C,3C]
S_D = jnp.stack([jnp.broadcast_to(U[i]["col_scale"], (3 * C,)) for i in DUAL_IDX])
B_D = jnp.stack([jnp.broadcast_to(U[i]["bias"], (C,)) for i in DUAL_IDX])
BETA_D = jnp.stack([jnp.broadcast_to(U[i]["beta"], (C,)) for i in DUAL_IDX])
TH_D = jnp.stack([jnp.broadcast_to(U[i]["theta"], (C,)) for i in DUAL_IDX])
RESET = "zero" if engine.hard_reset else "subtract"


def batched_unit(cols_flat, w, scale, bias, beta, theta, mem, Ub):
    """[Ub, M, K] @ [Ub, K, 3C] -> dy epilogue -> LIF, all stacked."""
    Zi = jax.lax.dot_general(
        cols_flat, w, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    Z = Zi.astype(jnp.bfloat16).reshape(Ub * B, H, W, 3 * C) * jnp.repeat(
        scale, B, axis=0
    )[:, None, None, :]
    y = dy_epilogue(Z, H, C).reshape(Ub, B, H, W, C) + bias[:, None, None, None, :]
    spk, mem_out = leaky_step(
        y, mem, beta[:, None, None, None, :], theta[:, None, None, None, :],
        reset=RESET, alpha=engine.alpha,
    )
    return spk.astype(jnp.int8), mem_out


def wave_step(carry, xi):
    # hs[i]: spike output of unit i from the previous step (int8 [B,H,W,C])
    hs, mem_ff, mem_d, mem_h = carry

    # head: window t
    cols_h = cols_dx(xi)
    Zi = jax.lax.dot_general(
        cols_h.reshape(-1, cols_h.shape[-1]), U[0]["w"],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
    )
    Z = Zi.astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * U[0]["col_scale"]
    y = dy_epilogue(Z, H, C) + U[0]["bias"]
    spk_h, mem_h = leaky_step(
        y, mem_h, U[0]["beta"], U[0]["theta"], reset=RESET, alpha=engine.alpha
    )
    spk_h = spk_h.astype(jnp.int8)

    # dual units: input = previous step's output of unit i-1; rec = own prev
    xin_d = jnp.stack([hs[i - 1] for i in DUAL_IDX])
    hb = jnp.concatenate([xin_d, jnp.stack([hs[i] for i in DUAL_IDX])], axis=-1)
    cols_d = cols_dx(hb.reshape(2 * B, H, W, 2 * C)).reshape(2, B * H * W, 6 * C)
    spk_d, mem_d = batched_unit(cols_d, W_D, S_D, B_D, BETA_D, TH_D, mem_d, 2)

    # ff units
    xin_f = jnp.stack([hs[i - 1] for i in FF_IDX])
    cols_f = cols_dx(xin_f.reshape(4 * B, H, W, C)).reshape(4, B * H * W, 3 * C)
    spk_f, mem_ff = batched_unit(cols_f, W_FF, S_FF, B_FF, BETA_FF, TH_FF, mem_ff, 4)

    new_hs = [None] * 7
    new_hs[0] = spk_h
    for k, i in enumerate(DUAL_IDX):
        new_hs[i] = spk_d[k]
    for k, i in enumerate(FF_IDX):
        new_hs[i] = spk_f[k]

    flow = jnp.einsum(
        "bhwc,co->bhwo", hs[6].astype(jnp.bfloat16),
        engine.params["pred_kernel"][0, 0],
    )
    if engine.params["pred_bias"] is not None:
        flow = flow + engine.params["pred_bias"]
    flow = jnp.tanh(flow).astype(jnp.float32)
    return (tuple(new_hs), mem_ff, mem_d, mem_h), flow.sum()


def bench_wave(iters=6):
    xi = jnp.clip(jnp.round(window), -127, 127).astype(jnp.int8)
    z = lambda: jnp.zeros((B, H, W, C), jnp.int8)
    mem = lambda n: jnp.zeros((n, B, H, W, C), jnp.bfloat16)

    def run(carry):
        def step(c, _):
            return wave_step(c, xi)

        final, fs = jax.lax.scan(step, carry, None, length=T)
        return fs.sum(), final

    run_j = jax.jit(run, donate_argnums=(0,))
    carry = (tuple(z() for _ in range(7)), mem(4), mem(2),
             jnp.zeros((B, H, W, C), jnp.bfloat16))
    t0 = time.time()
    s, carry = run_j(carry)
    float(s)
    cs = time.time() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        s, carry = run_j(carry)
        float(s)
        best = min(best, time.perf_counter() - t0)
    print(f"wavefront: compile {cs:.0f}s, {best / T * 1e3:.3f} ms/win -> "
          f"{T * B / best:.0f} win/s", flush=True)


def bench_control(iters=6):
    def run(params, window, states):
        def step(st, _):
            out, new_st = engine.apply(params, None, window, st)
            return new_st, out["flow"][0].sum()

        final, fsum = jax.lax.scan(step, states, None, length=T)
        return fsum.sum(), final

    run_j = jax.jit(run, donate_argnums=(2,))
    st = engine.init_states(B, H, W)
    t0 = time.time()
    s, st = run_j(engine.params, window, st)
    float(s)
    cs = time.time() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        s, st = run_j(engine.params, window, st)
        float(s)
        best = min(best, time.perf_counter() - t0)
    print(f"control  : compile {cs:.0f}s, {best / T * 1e3:.3f} ms/win -> "
          f"{T * B / best:.0f} win/s", flush=True)


def exactness(steps=5):
    """Wavefront flow at step s is the sequential flow of window s - 7
    (pred reads unit 6's previous-step spike). Bit-identical expected:
    the batched int8 dots are the same int32 accumulations."""
    xi = jnp.clip(jnp.round(window), -127, 127).astype(jnp.int8)

    def seq(n):
        st = engine.init_states(B, H, W)
        outs = []
        for _ in range(n):
            out, st = engine.apply(engine.params, None, window, st)
            outs.append(out["flow"][0])
        return jnp.stack(outs)

    def wave(n):
        z = lambda: jnp.zeros((B, H, W, C), jnp.int8)
        carry = (tuple(z() for _ in range(7)),
                 jnp.zeros((4, B, H, W, C), jnp.bfloat16),
                 jnp.zeros((2, B, H, W, C), jnp.bfloat16),
                 jnp.zeros((B, H, W, C), jnp.bfloat16))
        outs = []
        for s in range(n):
            # fill gating: unit i first sees window 0 at step i — before
            # that its input is the zero fill, and integrating y=bias into
            # the membrane would diverge from the sequential engine's zero
            # start state. s is static, so the selects fold at trace time.
            old = carry
            carry, _ = wave_step(carry, xi)
            hs = tuple(
                carry[0][i] if s >= i else old[0][i] for i in range(7)
            )
            mem_ff = jnp.stack([
                carry[1][k] if s >= FF_IDX[k] else old[1][k] for k in range(4)
            ])
            mem_d = jnp.stack([
                carry[2][k] if s >= DUAL_IDX[k] else old[2][k] for k in range(2)
            ])
            carry = (hs, mem_ff, mem_d, carry[3])
            outs.append(_flow_of(carry))
        return jnp.stack(outs)

    def _flow_of(carry):
        flow = jnp.einsum("bhwc,co->bhwo", carry[0][6].astype(jnp.bfloat16),
                          engine.params["pred_kernel"][0, 0])
        if engine.params["pred_bias"] is not None:
            flow = flow + engine.params["pred_bias"]
        return jnp.tanh(flow).astype(jnp.float32)

    f_seq = np.asarray(jax.jit(seq, static_argnums=0)(steps))
    f_wav = np.asarray(jax.jit(wave, static_argnums=0)(steps + 6))
    # _flow_of(carry after step s) uses unit-6 spike of window s - 6
    same = np.array_equal(f_seq, f_wav[6:])
    print("exactness seq vs wavefront:",
          "BIT-IDENTICAL" if same else
          f"MISMATCH max |d|={np.max(np.abs(f_seq - f_wav[6:]))}", flush=True)
    assert same


if __name__ == "__main__":
    which = sys.argv[1:] or ["control", "wave"]
    if "exact" in which:
        exactness()
    if "control" in which:
        bench_control()
    if "wave" in which:
        bench_wave()
