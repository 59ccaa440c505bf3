"""Round 2: pinpoint which v7-specific construct trips 'Only 2D gather'.
  6 p-narrow   : dynamic load of [L,C,3] (3-wide lane dim)
  7 patches+dot: dy_group_patches(concat/pad) of dyn-loaded src, in fori_loop
  8 5d-store   : dynamic store of [1,1,C,TH,W] into blocked (L,1,C,TH,W) out
  9 dma-store-fixed: probe 4 with correct .at[] ref syntax
"""
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, C, E, W, TH = 4, 32, 24, 256, 8

def go(name, fn):
    try:
        s = float(jnp.sum(fn()))
        print(f"OK   {name}: sum={s:.0f}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {repr(e)[:160]}", flush=True)

# 6: narrow-lane dynamic load [L,C,3]
def k6(p_ref, o_ref):
    def body(l, _):
        pv = p_ref[pl.ds(l, 1)][0]  # [C,3]
        o_ref[:] = o_ref[:] + pv[:, 1][:, None, None]
        return 0
    o_ref[:] = jnp.zeros((C, E, W), jnp.float32)
    jax.lax.fori_loop(0, L, body, 0)
go("6 p-narrow", lambda: pl.pallas_call(
    k6, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((C, E, W), lambda i: (0, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((C, E, W), jnp.float32),
)(jnp.ones((L, C, 3), jnp.float32)))

# 7: halo patches (pad+concat) of dynamically loaded src + dot, in fori_loop
def k7(x_ref, w_ref, o_ref):
    def patches(src, dy):
        z_col = jnp.zeros((C, E, 1), src.dtype)
        z_row = jnp.zeros((C, 1, W + 2), src.dtype)
        vp = jnp.concatenate([z_col, src, z_col], axis=2)
        vp = jnp.concatenate([z_row, vp, z_row], axis=1)
        sub = vp[:, dy : dy + E, :]
        return jnp.concatenate([sub[:, :, dx : dx + W] for dx in range(3)], axis=0)
    def body(l, _):
        hv = x_ref[pl.ds(l, 1)][0]
        wv = w_ref[pl.ds(l, 1)][0]
        acc = jnp.zeros((C, E, W), jnp.float32)
        for dy in range(3):
            pg = patches(hv, dy)
            acc = acc + jax.lax.dot_general(
                wv[:, dy * 3 * C : (dy + 1) * 3 * C], pg,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        o_ref[:] = o_ref[:] + acc
        return 0
    o_ref[:] = jnp.zeros((C, E, W), jnp.float32)
    jax.lax.fori_loop(0, L, body, 0)
go("7 patches+dot", lambda: pl.pallas_call(
    k7, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((C, E, W), lambda i: (0, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((C, E, W), jnp.float32),
)(jnp.ones((L, C, E, W), jnp.float32), jnp.ones((L, C, 9 * C), jnp.float32)))

# 8: 5-D dynamic store into blocked (L,1,C,TH,W) output
def k8(x_ref, o_ref):
    def body(l, _):
        v = x_ref[pl.ds(l, 1)][0]  # [C,E,W]
        o_ref[pl.ds(l, 1)] = v[None, None, :, 8 : 8 + TH, :] * 2.0
        return 0
    jax.lax.fori_loop(0, L, body, 0)
go("8 5d-store", lambda: pl.pallas_call(
    k8, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((L, 1, C, TH, W), lambda i: (0, 0, 0, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((L, 1, C, TH, W), jnp.float32),
)(jnp.ones((L, C, E, W), jnp.float32)))

# 9: DMA store to ANY output at dynamic leading index (fixed ref syntax)
def k9(x_ref, o_hbm, stage, sem):
    def body(l, _):
        stage[:] = x_ref[pl.ds(l, 1)][0] * 3.0
        d = pltpu.make_async_copy(stage, o_hbm.at[l], sem)
        d.start()
        d.wait()
        return 0
    jax.lax.fori_loop(0, L, body, 0)
go("9 dma-store-fixed", lambda: pl.pallas_call(
    k9, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
    out_shape=jax.ShapeDtypeStruct((L, C, E, W), jnp.float32),
    scratch_shapes=[pltpu.VMEM((C, E, W), jnp.float32), pltpu.SemaphoreType.DMA],
)(jnp.ones((L, C, E, W), jnp.float32)))
