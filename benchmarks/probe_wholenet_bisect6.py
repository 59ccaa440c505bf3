import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, TH, Cin = 2, 64, 256, 32, 16, 32
E = TH + 16
Hp = H + 2 * TH

def build(mode):
    def lif(ff, mem, beta, theta):
        if mode == "passthrough":
            return (ff + 0.5 * mem > 0.5).astype(jnp.float32), ff
        if mode == "one_where":
            u = jnp.where(mem > theta, jnp.zeros_like(ff), beta * mem + ff)
            return (u > theta).astype(jnp.float32), u
        if mode == "two_where":
            u = jnp.where(mem > theta, jnp.zeros_like(ff), beta * mem + ff)
            spk = (u > theta).astype(jnp.float32)
            mem2 = jnp.where(u > theta, jnp.zeros_like(u), u)
            return spk, mem2
        raise ValueError(mode)

    def kernel(x_hbm, m0_hbm, m1_hbm, w0_ref, w1_ref,
               o0_ref, o1_ref, flow_ref,
               sx, sm0, sm1, sem0, sem1, sem2):
        b = pl.program_id(0); i = pl.program_id(1)
        r0 = i * TH + 8
        c0 = pltpu.make_async_copy(x_hbm.at[b, :, pl.ds(r0, E), :], sx, sem0)
        c1 = pltpu.make_async_copy(m0_hbm.at[b, :, pl.ds(r0, E), :], sm0, sem1)
        c2 = pltpu.make_async_copy(m1_hbm.at[b, :, pl.ds(r0, E), :], sm1, sem2)
        c0.start(); c1.start(); c2.start()
        c0.wait(); c1.wait(); c2.wait()

        def patches(v, ro):
            z = jnp.zeros((v.shape[0], v.shape[1], 1), v.dtype)
            vp = jnp.concatenate([z, v, z], axis=2)
            return jnp.concatenate(
                [vp[:, dy:dy+ro, dx:dx+W] for dy in range(3) for dx in range(3)], axis=0)

        beta = jnp.float32(0.5); theta = jnp.float32(0.5)
        ro1 = E - 2
        ff1 = jax.lax.dot_general(w0_ref[:], patches(sx[:], ro1),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        spk1, mem1o = lif(ff1, sm0[:, 1:1+ro1, :].astype(jnp.float32), beta, theta)
        o0_ref[0] = mem1o[:, 7:7+TH, :].astype(jnp.bfloat16)
        h = spk1.astype(jnp.bfloat16)
        ro2 = E - 4
        ff2 = jax.lax.dot_general(w1_ref[:], patches(h[:, 0:ro2+2, :], ro2),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        spk2, mem2o = lif(ff2, sm1[:, 2:2+ro2, :].astype(jnp.float32), beta, theta)
        o1_ref[0] = mem2o[:, 6:6+TH, :].astype(jnp.bfloat16)
        flow_ref[0] = spk2[:2, 6:6+TH, :]

    @jax.jit
    def run(x, m0, m1, w0, w1):
        return pl.pallas_call(
            kernel, grid=(B, H // TH),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3
                     + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=[pl.BlockSpec((1, C, TH, W), lambda b, i: (b, 0, i + 1, 0)),
                       pl.BlockSpec((1, C, TH, W), lambda b, i: (b, 0, i + 1, 0)),
                       pl.BlockSpec((1, 2, TH, W), lambda b, i: (b, 0, i, 0))],
            out_shape=[jax.ShapeDtypeStruct((B, C, Hp, W), jnp.bfloat16),
                       jax.ShapeDtypeStruct((B, C, Hp, W), jnp.bfloat16),
                       jax.ShapeDtypeStruct((B, 2, H, W), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((Cin, E, W), jnp.bfloat16),
                            pltpu.VMEM((C, E, W), jnp.bfloat16),
                            pltpu.VMEM((C, E, W), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        )(x, m0, m1, w0, w1)
    return run

key = jax.random.PRNGKey(0)
args = (jax.random.normal(key, (B, Cin, Hp, W), jnp.bfloat16),
        jnp.zeros((B, C, Hp, W), jnp.bfloat16),
        jnp.zeros((B, C, Hp, W), jnp.bfloat16),
        jax.random.normal(key, (C, 9*Cin), jnp.bfloat16) * 0.05,
        jax.random.normal(key, (C, 9*C), jnp.bfloat16) * 0.05)
for mode in ("passthrough", "one_where", "two_where"):
    try:
        out = build(mode)(*args)
        _ = float(out[2].sum())
        print(f"{mode}: OK", flush=True)
    except Exception as e:
        print(f"{mode}: FAIL {repr(e)[:100]}", flush=True)
