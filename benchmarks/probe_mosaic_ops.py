import jax, jax.numpy as jnp, numpy as np, functools, time
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, K, E, W = 32, 288, 32, 256

def k_dot3(w_ref, x_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        w_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

def k_roll(x_ref, o_ref):
    v = x_ref[:]
    r = pltpu.roll(v, 1, 2)  # lanes
    r2 = pltpu.roll(v, 1, 1)  # sublanes
    o_ref[:] = (r + r2).astype(jnp.float32)

w = jax.random.normal(jax.random.PRNGKey(0), (C, K), jnp.bfloat16)
x3 = jax.random.normal(jax.random.PRNGKey(1), (K, E, W), jnp.bfloat16)
xr = jax.random.normal(jax.random.PRNGKey(2), (C, E, W), jnp.bfloat16)

try:
    out = pl.pallas_call(k_dot3,
        out_shape=jax.ShapeDtypeStruct((C, E, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(w, x3)
    print("dot3 OK", float(out.sum()), flush=True)
except Exception as e:
    print("dot3 FAIL:", repr(e)[:200], flush=True)

try:
    out = pl.pallas_call(k_roll,
        out_shape=jax.ShapeDtypeStruct((C, E, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(xr)
    print("roll OK", float(out.sum()), flush=True)
except Exception as e:
    print("roll FAIL:", repr(e)[:200], flush=True)

# also: concat along dim0 of 3-D values, jnp.pad on values, iota masks
def k_misc(x_ref, o_ref):
    v = x_ref[:]
    cat = jnp.concatenate([v, v, v], axis=0)  # [3C, E, W]
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (C, E, W), 2)
    masked = jnp.where(lane_idx > 0, v, 0.0)
    o_ref[:] = (cat[:C] + masked).astype(jnp.float32)

try:
    out = pl.pallas_call(k_misc,
        out_shape=jax.ShapeDtypeStruct((C, E, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(xr)
    print("misc OK", float(out.sum()), flush=True)
except Exception as e:
    print("misc FAIL:", repr(e)[:200], flush=True)
