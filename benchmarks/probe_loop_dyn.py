"""Bisect which dynamic-index construct inside an in-kernel fori_loop trips
the 'Only 2D gather is supported' Mosaic lowering error (v7 kernel blocker).
Probes, each a separate tiny pallas_call on TPU:
  1 dyn-load   : acc += smem[pl.ds(l,1)] in fori_loop
  2 dyn-load+dot: + dot_general with w[pl.ds(l,1)]
  3 dyn-store  : scratch2[pl.ds(l,1)] = val
  4 dma-store  : static stage -> async copy to ANY output at [pl.ds(l,1)]
  5 dyn-load-where: slot = where(l==1,0,1) index form (v5's pattern)
"""
import sys; sys.path.insert(0, "/root/repo")
import functools, time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, C, E, W = 4, 32, 24, 256

def run(name, kernel, n_out_scratch=0, any_out=False):
    try:
        outs = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY) if any_out
                else pl.BlockSpec((C, E, W), lambda i: (0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((L, C, E, W) if any_out else (C, E, W),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((L, C, E, W), jnp.float32),
                            pltpu.VMEM((C, E, W), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )(jnp.ones((L, C, E, W), jnp.float32), jnp.ones((L, C, 3 * C), jnp.float32))
        s = float(jnp.sum(outs))
        print(f"OK   {name}: sum={s:.0f}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {repr(e)[:160]}", flush=True)

# 1: dynamic VMEM ref load in fori_loop
def k1(x_ref, w_ref, o_ref, scr, stage, sem):
    scr[:] = x_ref[:]
    def body(l, _):
        o_ref[:] = o_ref[:] + scr[pl.ds(l, 1)][0]
        return 0
    o_ref[:] = jnp.zeros((C, E, W), jnp.float32)
    jax.lax.fori_loop(0, L, body, 0)
run("1 dyn-load", k1)

# 2: + dot with dynamically loaded weights
def k2(x_ref, w_ref, o_ref, scr, stage, sem):
    scr[:] = x_ref[:]
    def body(l, _):
        wv = w_ref[pl.ds(l, 1)][0]          # [C, 3C]
        hv = scr[pl.ds(l, 1)][0]            # [C, E, W]
        pg = jnp.concatenate([hv, hv, hv], axis=0)  # [3C, E, W]
        o_ref[:] = o_ref[:] + jax.lax.dot_general(
            wv, pg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return 0
    o_ref[:] = jnp.zeros((C, E, W), jnp.float32)
    jax.lax.fori_loop(0, L, body, 0)
run("2 dyn-load+dot", k2)

# 3: dynamic VMEM ref store in fori_loop
def k3(x_ref, w_ref, o_ref, scr, stage, sem):
    def body(l, _):
        scr[pl.ds(l, 1)] = x_ref[pl.ds(l, 1)][0][None] * 2.0
        return 0
    jax.lax.fori_loop(0, L, body, 0)
    o_ref[:] = scr[0]
run("3 dyn-store", k3)

# 4: DMA store to ANY output at dynamic leading index
def k4(x_ref, w_ref, o_hbm, scr, stage, sem):
    def body(l, _):
        stage[:] = x_ref[pl.ds(l, 1)][0] * 3.0
        d = pltpu.make_async_copy(stage, o_hbm.at[pl.ds(l, 1)][0], sem)
        d.start()
        d.wait()
        return 0
    jax.lax.fori_loop(0, L, body, 0)
run("4 dma-store", k4, any_out=True)

# 5: where()-computed index load (v5's slot pattern) in fori_loop
def k5(x_ref, w_ref, o_ref, scr, stage, sem):
    scr[:] = x_ref[:]
    def body(l, _):
        slot = jnp.where(l == 1, 0, jnp.where(l == 2, 1, 2))
        o_ref[:] = o_ref[:] + scr[pl.ds(slot, 1)][0]
        return 0
    o_ref[:] = jnp.zeros((C, E, W), jnp.float32)
    jax.lax.fori_loop(0, L, body, 0)
run("5 dyn-load-where", k5)
