import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, K, E, W, L = 32, 288, 32, 256, 7

# Probe 1: dynamic leading-index read of a stacked VMEM weights ref +
# persistent scratch across grid steps + conditional DMA
def kernel(w_all_ref, m_hbm, o_ref, acc, sdma, sem):
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    is_even = (l % 2) == 0

    @pl.when(is_even)
    def _():
        dma = pltpu.make_async_copy(m_hbm.at[l, :, pl.ds(0, E), :], sdma, sem)
        dma.start()
        dma.wait()

    @pl.when(jnp.logical_not(is_even))
    def _():
        sdma[:] = jnp.zeros_like(sdma)

    w = w_all_ref[pl.ds(l, 1)][0]  # dynamic leading index -> [C, K]
    pat = jnp.concatenate([sdma[:, : E - 2, :]] * 9, axis=0)  # [9C, E-2, W]
    ff = jax.lax.dot_general(w, pat, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc[:] = acc[:] + ff

    @pl.when(l == L - 1)
    def _():
        o_ref[0] = acc[:]

@jax.jit
def run(w_all, m):
    return pl.pallas_call(
        kernel, grid=(L,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, C, E - 2, W), lambda l: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, C, E - 2, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, E - 2, W), jnp.float32),
                        pltpu.VMEM((C, E, W), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(w_all, m)

key = jax.random.PRNGKey(0)
w_all = jax.random.normal(key, (L, C, 9 * C), jnp.bfloat16) * 0.05
m = jax.random.normal(key, (L, C, E + 8, W), jnp.bfloat16)
try:
    out = run(w_all, m)
    print("layer-grid primitives OK", float(out.sum()), flush=True)
except Exception as e:
    print("layer-grid FAIL:", repr(e)[:200], flush=True)
