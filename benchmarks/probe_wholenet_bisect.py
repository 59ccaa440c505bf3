import sys; sys.path.insert(0, "/root/repo")
import functools, time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, H, W, TH = 32, 64, 256, 16
E = TH + 16

# Probe A: manual DMA + patches + dot_general + blocked write (single layer)
def kA(x_hbm, w_ref, p_ref, o_ref, sx, sem):
    b = pl.program_id(0); i = pl.program_id(1)
    r0 = i * TH + (TH - 8)
    dma = pltpu.make_async_copy(x_hbm.at[b, :, pl.ds(r0, E), :], sx, sem)
    dma.start(); dma.wait()
    v = sx[:]
    z = jnp.zeros((C, E, 1), v.dtype)
    vp = jnp.concatenate([z, v, z], axis=2)
    subs = [vp[:, dy:dy+E-2, dx:dx+W] for dy in range(3) for dx in range(3)]
    pat = jnp.concatenate(subs, axis=0)
    ff = jax.lax.dot_general(w_ref[:], pat, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    beta = p_ref[:, 0][:, None, None]
    o_ref[0] = (ff * beta)[:, 7:7+TH, :]

@jax.jit
def runA(x, w, p):
    return pl.pallas_call(
        kA, grid=(1, H // TH),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C, TH, W), lambda b, i: (b, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((1, C, H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, E, W), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x, w, p)

x = jax.random.normal(jax.random.PRNGKey(0), (1, C, H + 2*TH, W), jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(1), (C, 9*C), jnp.bfloat16)
p = jnp.ones((C, 3), jnp.float32)
try:
    out = runA(x, w, p); print("A (dma+dot) OK", float(out.sum()), flush=True)
except Exception as e:
    print("A FAIL:", repr(e)[:150], flush=True)

# Probe B: 7 chained dots on VMEM block inputs (program size, no DMA)
def kB(x_ref, w_ref, o_ref):
    v = x_ref[0]  # [C, E, W]
    for l in range(7):
        z = jnp.zeros((C, v.shape[1], 1), jnp.bfloat16)
        vp = jnp.concatenate([z, v.astype(jnp.bfloat16), z], axis=2)
        ro = v.shape[1] - 2
        subs = [vp[:, dy:dy+ro, dx:dx+W] for dy in range(3) for dx in range(3)]
        pat = jnp.concatenate(subs, axis=0)
        ff = jax.lax.dot_general(w_ref[:], pat, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        v = (ff > 0.0).astype(jnp.float32)
    o_ref[0] = v[:, :TH, :]

@jax.jit
def runB(x, w):
    return pl.pallas_call(
        kB, grid=(1, H // TH),
        in_specs=[pl.BlockSpec((1, C, E, W), lambda b, i: (b, 0, i, 0)),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C, TH, W), lambda b, i: (b, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((1, C, H, W), jnp.float32),
    )(x, w)

xb = jax.random.normal(jax.random.PRNGKey(0), (1, C, (H//TH)*E, W), jnp.bfloat16)
try:
    out = runB(xb, w); print("B (7 chained dots) OK", float(out.sum()), flush=True)
except Exception as e:
    print("B FAIL:", repr(e)[:150], flush=True)
