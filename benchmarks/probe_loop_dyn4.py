"""Round 4: find the remote-compiler ICE trigger in the v7 fori_loop body.
All inputs via VMEM specs (no DMA prologue), tiny shapes, grid=(1,).
  13 full-body  : dyn loads + patches + 2 dots + LIF + dyn sout stores + hbuf chain
  14 no-LIF     : same but passthrough membrane (mem2 = ff)
  15 no-dyn-out : full LIF but only static final store (no per-layer dyn stores)
"""
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, C, E, W, TH = 4, 32, 24, 256, 8

def patches(src, dy):
    z_col = jnp.zeros((C, E, 1), src.dtype)
    z_row = jnp.zeros((C, 1, W + 2), src.dtype)
    vp = jnp.concatenate([z_col, src, z_col], axis=2)
    vp = jnp.concatenate([z_row, vp, z_row], axis=1)
    sub = vp[:, dy : dy + E, :]
    return jnp.concatenate([sub[:, :, dx : dx + W] for dx in range(3)], axis=0)

def make_kernel(with_lif, dyn_out):
    def kernel(x_ref, w_ref, p_ref, smem_ref, o_ref, hbuf, sout):
        hbuf[:] = x_ref[:]
        def body(l, _):
            wv = w_ref[pl.ds(l, 1)][0]           # [C, 18C] bf16
            hv = hbuf[:]
            slot = jnp.where(l == 1, 0, jnp.where(l == 2, 1, 2))
            av = hbuf[:]  # stand-in for saux slot (same shape/dtype)
            ff = jnp.zeros((C, E, W), jnp.float32)
            for dy in range(3):
                pg = patches(hv, dy)
                ff = ff + jax.lax.dot_general(
                    wv[:, dy * 3 * C : (dy + 1) * 3 * C], pg,
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            for dy in range(3):
                pg = patches(av, dy)
                ff = ff + jax.lax.dot_general(
                    wv[:, (9 + dy * 3) * C : (9 + (dy + 1) * 3) * C], pg,
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            pv = p_ref[pl.ds(l, 1)][0]
            bias = pv[:, 0][:, None, None]
            beta = pv[:, 1][:, None, None]
            theta = pv[:, 2][:, None, None]
            ff = ff + bias
            mem = smem_ref[pl.ds(l, 1)][0].astype(jnp.float32)
            if with_lif:
                u = jnp.where(mem > theta, jnp.zeros_like(ff), beta * mem + ff)
                spk = (u > theta).astype(jnp.float32)
                mem2 = jnp.where(u > theta, jnp.zeros_like(u), u)
            else:
                spk = ff
                mem2 = ff + mem
            if dyn_out:
                sout[pl.ds(l, 1)] = jax.lax.expand_dims(
                    jax.lax.slice_in_dim(mem2, 8, 8 + TH, axis=1), [0]
                ).astype(jnp.bfloat16)
            hbuf[:] = spk.astype(jnp.bfloat16)
            return 0
        jax.lax.fori_loop(0, L, body, 0)
        if dyn_out:
            o_ref[:] = sout[:].astype(jnp.float32)
        else:
            o_ref[:] = jnp.broadcast_to(
                jax.lax.slice_in_dim(hbuf[:], 8, 8 + TH, axis=1).astype(
                    jnp.float32)[None], (L, C, TH, W))
    return kernel

def go(name, with_lif, dyn_out):
    try:
        out = pl.pallas_call(
            make_kernel(with_lif, dyn_out), grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec((L, C, TH, W), lambda i: (0, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((L, C, TH, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((C, E, W), jnp.bfloat16),
                            pltpu.VMEM((L, C, TH, W), jnp.bfloat16)],
        )(jnp.ones((C, E, W), jnp.bfloat16) * 0.1,
          jnp.ones((L, C, 18 * C), jnp.bfloat16) * 0.01,
          jnp.ones((L, C, 3), jnp.float32) * 0.5,
          jnp.ones((L, C, E, W), jnp.bfloat16) * 0.2)
        print(f"OK   {name}: sum={float(jnp.sum(out)):.1f}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {repr(e)[:140]}", flush=True)

go("13 full-body", True, True)
go("14 no-LIF", False, True)
go("15 no-dyn-out", True, False)
