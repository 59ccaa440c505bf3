"""Round 3: is bf16 the blocker for dynamic VMEM indexing in fori_loop?
  10 dyn-load bf16  : acc += bf16 scr[pl.ds(l,1)]
  11 dyn-store bf16 : bf16 scr[pl.ds(l,1)] = val
  12 dyn-load bf16 w + dot
"""
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, C, E, W = 4, 32, 24, 256

def go(name, fn):
    try:
        s = float(jnp.sum(fn()))
        print(f"OK   {name}: sum={s:.0f}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {repr(e)[:160]}", flush=True)

def k10(x_ref, o_ref, scr):
    scr[:] = x_ref[:]
    def body(l, _):
        o_ref[:] = o_ref[:] + scr[pl.ds(l, 1)][0].astype(jnp.float32)
        return 0
    o_ref[:] = jnp.zeros((C, E, W), jnp.float32)
    jax.lax.fori_loop(0, L, body, 0)
go("10 dyn-load-bf16", lambda: pl.pallas_call(
    k10, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((C, E, W), lambda i: (0, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((C, E, W), jnp.float32),
    scratch_shapes=[pltpu.VMEM((L, C, E, W), jnp.bfloat16)],
)(jnp.ones((L, C, E, W), jnp.bfloat16)))

def k11(x_ref, o_ref, scr):
    def body(l, _):
        scr[pl.ds(l, 1)] = x_ref[pl.ds(l, 1)][0][None].astype(jnp.bfloat16) * 2.0
        return 0
    jax.lax.fori_loop(0, L, body, 0)
    o_ref[:] = scr[0].astype(jnp.float32)
go("11 dyn-store-bf16", lambda: pl.pallas_call(
    k11, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((C, E, W), lambda i: (0, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((C, E, W), jnp.float32),
    scratch_shapes=[pltpu.VMEM((L, C, E, W), jnp.bfloat16)],
)(jnp.ones((L, C, E, W), jnp.float32)))

def k12(x_ref, w_ref, o_ref):
    def body(l, _):
        hv = x_ref[pl.ds(l, 1)][0]          # bf16 [C,E,W]
        wv = w_ref[pl.ds(l, 1)][0]          # bf16 [C,3C]
        pg = jnp.concatenate([hv, hv, hv], axis=0)
        o_ref[:] = o_ref[:] + jax.lax.dot_general(
            wv, pg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return 0
    o_ref[:] = jnp.zeros((C, E, W), jnp.float32)
    jax.lax.fori_loop(0, L, body, 0)
go("12 dyn-load-bf16-dot", lambda: pl.pallas_call(
    k12, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((C, E, W), lambda i: (0, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((C, E, W), jnp.float32),
)(jnp.ones((L, C, E, W), jnp.bfloat16), jnp.ones((L, C, 3 * C), jnp.bfloat16)))
