"""Round 5: probe 13 (full loop body, compiles) + the remaining v7 pieces.
  16 +dma-prologue : inputs in ANY space, async-copied to VMEM at kernel start
  17 +grid+flush   : 16 + grid=(2,2) + blocked 5-D outputs + static flush + pred head
(17 == the complete v7 structure at small scale)
"""
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, C, W, TH = 4, 32, 256, 8
E = TH + 16  # 24

def patches(src, dy):
    z_col = jnp.zeros((C, E, 1), src.dtype)
    z_row = jnp.zeros((C, 1, W + 2), src.dtype)
    vp = jnp.concatenate([z_col, src, z_col], axis=2)
    vp = jnp.concatenate([z_row, vp, z_row], axis=1)
    sub = vp[:, dy : dy + E, :]
    return jnp.concatenate([sub[:, :, dx : dx + W] for dx in range(3)], axis=0)

def loop_body_factory(w_ref, p_ref, smem_all, saux_all, sout_m, sout_s, hbuf):
    def body(l, _):
        wv = w_ref[pl.ds(l, 1)][0]
        hv = hbuf[:]
        slot = jnp.where(l == 1, 0, jnp.where(l == 2, 1, 2))
        av = saux_all[pl.ds(slot, 1)][0]
        ff = jnp.zeros((C, E, W), jnp.float32)
        for dy in range(3):
            ff = ff + jax.lax.dot_general(
                wv[:, dy * 3 * C : (dy + 1) * 3 * C], patches(hv, dy),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        for dy in range(3):
            ff = ff + jax.lax.dot_general(
                wv[:, (9 + dy * 3) * C : (9 + (dy + 1) * 3) * C], patches(av, dy),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        pv = p_ref[pl.ds(l, 1)][0]
        bias = pv[:, 0][:, None, None]
        beta = pv[:, 1][:, None, None]
        theta = pv[:, 2][:, None, None]
        ff = ff + bias
        mem = smem_all[pl.ds(l, 1)][0].astype(jnp.float32)
        u = jnp.where(mem > theta, jnp.zeros_like(ff), beta * mem + ff)
        spk = (u > theta).astype(jnp.float32)
        mem2 = jnp.where(u > theta, jnp.zeros_like(u), u)
        sout_m[pl.ds(l, 1)] = jax.lax.expand_dims(
            jax.lax.slice_in_dim(mem2, 8, 8 + TH, axis=1), [0]).astype(jnp.bfloat16)
        sout_s[pl.ds(slot, 1)] = jax.lax.expand_dims(
            jax.lax.slice_in_dim(spk, 8, 8 + TH, axis=1), [0]).astype(jnp.bfloat16)
        hbuf[:] = spk.astype(jnp.bfloat16)
        return 0
    return body

# ---- 16: + DMA prologue, grid=(1,), simple output
def k16(x_hbm, mem_hbm, spk_hbm, w_ref, p_ref, o_ref,
        hbuf, smem_all, saux_all, sout_m, sout_s, sem_x, sem_a0, sem_a1, *sems_m):
    r0 = 0
    dx = pltpu.make_async_copy(x_hbm.at[0, :, pl.ds(r0, E), :], hbuf, sem_x)
    dx.start()
    dms = []
    for ll in range(L):
        d = pltpu.make_async_copy(mem_hbm.at[ll, 0, :, pl.ds(r0, E), :],
                                  smem_all.at[ll], sems_m[ll])
        d.start(); dms.append(d)
    das = []
    for s in range(2):
        d = pltpu.make_async_copy(spk_hbm.at[s, 0, :, pl.ds(r0, E), :],
                                  saux_all.at[s], (sem_a0, sem_a1)[s])
        d.start(); das.append(d)
    saux_all[2] = jnp.zeros((C, E, W), jnp.bfloat16)
    dx.wait()
    for d in dms: d.wait()
    for d in das: d.wait()
    jax.lax.fori_loop(0, L, loop_body_factory(
        w_ref, p_ref, smem_all, saux_all, sout_m, sout_s, hbuf), 0)
    o_ref[:] = sout_m[:].astype(jnp.float32)

try:
    out = pl.pallas_call(
        k16, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((L, C, TH, W), lambda i: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((L, C, TH, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, E, W), jnp.bfloat16),
                        pltpu.VMEM((L, C, E, W), jnp.bfloat16),
                        pltpu.VMEM((3, C, E, W), jnp.bfloat16),
                        pltpu.VMEM((L, C, TH, W), jnp.bfloat16),
                        pltpu.VMEM((3, C, TH, W), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA]
                       + [pltpu.SemaphoreType.DMA for _ in range(L)],
    )(jnp.ones((1, C, E, W), jnp.bfloat16) * 0.1,
      jnp.ones((L, 1, C, E, W), jnp.bfloat16) * 0.2,
      jnp.ones((3, 1, C, E, W), jnp.bfloat16) * 0.3,
      jnp.ones((L, C, 18 * C), jnp.bfloat16) * 0.01,
      jnp.ones((L, C, 3), jnp.float32) * 0.5)
    print(f"OK   16 +dma-prologue: sum={float(jnp.sum(out)):.1f}", flush=True)
except Exception as e:
    print(f"FAIL 16 +dma-prologue: {repr(e)[:140]}", flush=True)

# ---- 17: full v7 structure at small scale via the real module
from evflow.registry import build_model
from benchmarks.pallas_archive.fused_net_loop2 import LoopFusedFireNet2
B, H = 2, 16
cfg = {"name": "LIFFireNet", "num_bins": 2, "base_num_channels": 32,
       "kernel_size": 3, "encoding": "cnt",
       "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
model = build_model(cfg)
variables = model.init(jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)),
                       model.init_states(B, H, W))
window = jax.random.poisson(jax.random.PRNGKey(1), 0.05, (B, H, W, 2)).astype(jnp.float32)
lp = LoopFusedFireNet2(model, variables, tile_rows=8)
st = lp.init_states(B, H, W)
try:
    flow, st2 = lp.step(window, st)
    print(f"OK   17 full-v7-small: sum={float(flow.sum()):.3f}", flush=True)
except Exception as e:
    print(f"FAIL 17 full-v7-small: {repr(e)[:140]}", flush=True)
