"""Engine-variant bench on the REAL configuration (T=256, donated states):

  var0  control          : Int8DeployEngine.apply as shipped
  var1  split dual GEMM  : recurrent units run TWO K=3C dots (ff, rec) and
                           add the int32 accumulators — avoids assembling the
                           [.,6C] dual cols buffer whose DUS chains profile
                           at ~26% of the step (profile_bench.py)
  var2  bf16 mem quant   : membrane int8 (de)quant arithmetic in bf16 —
                           halves the VPU work of the clamp_convert fusions
                           (~25% of the step) at a grid-precision cost that
                           must be re-validated (deploy_aee_tiers) before
                           adoption
  var3  var1 + var2

Run: python benchmarks/bench_engine_variants.py [var0 var1 var2 var3]
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from evflow.deploy import Int8DeployEngine, _mem_dequant
from evflow.ops.dypack import cols_dx, dy_epilogue
from evflow.ops.lif import LIFState, leaky_step
from evflow.registry import build_model

B, H, W, T = 8, 256, 256, 256
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
engine = Int8DeployEngine(model, variables, mem_dtype="mixed")
window = jax.random.poisson(key, 0.05, (B, H, W, 2)).astype(jnp.float32)


def mem_quant_f32(mem_out, unit):
    inv = unit.get("mem_inv_scale", 1.0 / unit["mem_scale"])
    return jnp.clip(
        jnp.round(mem_out.astype(jnp.float32) * inv) + unit["mem_zp"], -127, 127
    ).astype(jnp.int8)


def mem_quant_bf16(mem_out, unit):
    inv = unit.get("mem_inv_scale", 1.0 / unit["mem_scale"]).astype(jnp.bfloat16)
    zp = unit["mem_zp"].astype(jnp.bfloat16)
    return jnp.clip(
        jnp.round(mem_out * inv) + zp, -127, 127
    ).astype(jnp.int8)


def apply_variant(params, x, states, split_dual=False, bf16_quant=False):
    xi = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)
    h = xi
    new_states = []
    mq = mem_quant_bf16 if bf16_quant else mem_quant_f32
    for i, unit in enumerate(params["units"]):
        mem, prev_spk = states[i]
        mem_f = _mem_dequant(mem, unit) if engine.unit_mem_int8[i] else mem
        if engine.unit_recurrent[i] and split_dual == "bf16":
            # two K=3C dots, each converted+scaled at its own output fusion;
            # the add fuses elementwise (no int32 accumulator materializes)
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
            y = dy_epilogue(Z, H, C) + unit["bias"]
            spk, mem_out = leaky_step(
                y, mem_f, unit["beta"], unit["theta"],
                reset="zero" if engine.hard_reset else "subtract",
                alpha=engine.alpha,
            )
            h = spk.astype(jnp.int8)
            if engine.unit_mem_int8[i]:
                mem_out = mq(mem_out, unit)
            new_states.append(LIFState(mem_out, h))
            continue
        if engine.unit_recurrent[i] and split_dual:
            K = unit["w"].shape[0] // 2
            Zi = jax.lax.dot_general(
                cols_dx(h).reshape(-1, K), unit["w"][:K],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
            ) + jax.lax.dot_general(
                cols_dx(prev_spk).reshape(-1, K), unit["w"][K:],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
            )
        else:
            if engine.unit_recurrent[i]:
                cols = jnp.concatenate(
                    [cols_dx(h), cols_dx(prev_spk)], axis=-1)
            else:
                cols = cols_dx(h)
            Zi = jax.lax.dot_general(
                cols.reshape(-1, cols.shape[-1]), unit["w"],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
            )
        Z = Zi.astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * unit["col_scale"]
        y = dy_epilogue(Z, H, C) + unit["bias"]
        spk, mem_out = leaky_step(
            y, mem_f, unit["beta"], unit["theta"],
            reset="zero" if engine.hard_reset else "subtract", alpha=engine.alpha,
        )
        h = spk.astype(jnp.int8)
        if engine.unit_mem_int8[i]:
            mem_out = mq(mem_out, unit)
        new_states.append(LIFState(mem_out, h if engine.unit_recurrent[i] else None))
    hs = h.astype(jnp.bfloat16)
    flow = jnp.einsum("bhwc,co->bhwo", hs, params["pred_kernel"][0, 0])
    if params["pred_bias"] is not None:
        flow = flow + params["pred_bias"]
    return jnp.tanh(flow).astype(jnp.float32), tuple(new_states)


def bench(name, split_dual, bf16_quant, iters=8):
    def run(params, window, states):
        def step(st, _):
            flow, new_st = apply_variant(params, window, st,
                                         split_dual=split_dual,
                                         bf16_quant=bf16_quant)
            return new_st, flow.sum()

        final, fsum = jax.lax.scan(step, states, None, length=T)
        return fsum.sum(), final

    run_j = jax.jit(run, donate_argnums=(2,))
    est = engine.init_states(B, H, W)
    t0 = time.time()
    s, st = run_j(engine.params, window, est)
    float(s)
    cs = time.time() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        s, st = run_j(engine.params, window, st)
        float(s)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: compile {cs:.0f}s, {best/T*1e3:.3f} ms/win -> "
          f"{T*B/best:.0f} win/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["var0", "var1", "var2", "var3"]
    if "var0" in which:
        bench("var0 control        ", False, False)
    if "var1" in which:
        bench("var1 split dual GEMM", True, False)
    if "var2" in which:
        bench("var2 bf16 mem quant ", False, True)
    if "var3" in which:
        bench("var3 split + bf16   ", True, True)
    if "var4" in which:
        bench("var4 split dual bf16", "bf16", False)
