import sys; sys.path.insert(0, "/root/repo")
import functools, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, H, W, TH, HALO = 32, 64, 256, 16, 6
E = TH + 2 * HALO  # read extent

def kernel(x_hbm, o_ref, scratch, sem):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        x_hbm.at[0, :, pl.ds(i * TH, E), :], scratch, sem)
    dma.start()
    dma.wait()
    o_ref[0] = scratch[:, HALO:HALO + TH, :].astype(jnp.float32) * 2.0

@jax.jit
def run(x):
    return pl.pallas_call(
        kernel,
        grid=(H // TH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, C, TH, W), lambda i: (0, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((1, C, H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, E, W), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x)

x = jax.random.normal(jax.random.PRNGKey(0), (1, C, H + 2 * HALO, W), jnp.bfloat16)
try:
    out = run(x)
    s = float(out.sum())
    # check correctness: out rows i*TH..: x[halo + rows]
    ref = np.asarray(x[0, :, HALO:HALO + H, :], np.float32) * 2.0
    print("manual DMA OK, diff:", np.abs(np.asarray(out[0]) - ref).max(), flush=True)
except Exception as e:
    print("manual DMA FAIL:", repr(e)[:250], flush=True)
