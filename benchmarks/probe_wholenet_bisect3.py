import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, TH = 2, 64, 256, 32, 16
E = TH + 16
Hp = H + 2 * TH
Cin = 32

def build(variant):
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

        # layer 1
        ro1 = E - 2
        p1 = patches(sx[:], ro1)
        ff1 = jax.lax.dot_general(w0_ref[:], p1, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        mem1 = sm0[:, 1:1+ro1, :].astype(jnp.float32)
        spk1 = (ff1 + 0.5*mem1 > 0.5).astype(jnp.float32)
        o0_ref[0] = spk1[:, 7:7+TH, :].astype(jnp.bfloat16)

        # layer 2 variants
        ro2 = E - 4
        if variant == "h_chain":
            h2 = spk1.astype(jnp.bfloat16)          # [C, ro1, W]
            p2 = patches(h2[:, 0:ro2+2, :], ro2)
        elif variant == "from_scratch":
            p2 = patches(sx[:, 1:1+ro2+2, :], ro2)  # re-read scratch, no chain
        ff2 = jax.lax.dot_general(w1_ref[:], p2, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        mem2 = sm1[:, 2:2+ro2, :].astype(jnp.float32)
        spk2 = (ff2 + 0.5*mem2 > 0.5).astype(jnp.float32)
        o1_ref[0] = spk2[:, 6:6+TH, :].astype(jnp.bfloat16)
        flow_ref[0] = spk2[:, 6:6+TH, :]

    @jax.jit
    def run(x, m0, m1, w0, w1):
        return pl.pallas_call(
            kernel, grid=(B, H // TH),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3
                     + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=[pl.BlockSpec((1, C, TH, W), lambda b, i: (b, 0, i + 1, 0)),
                       pl.BlockSpec((1, C, TH, W), lambda b, i: (b, 0, i + 1, 0)),
                       pl.BlockSpec((1, C, TH, W), lambda b, i: (b, 0, i, 0))],
            out_shape=[jax.ShapeDtypeStruct((B, C, Hp, W), jnp.bfloat16),
                       jax.ShapeDtypeStruct((B, C, Hp, W), jnp.bfloat16),
                       jax.ShapeDtypeStruct((B, C, H, W), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((Cin, E, W), jnp.bfloat16),
                            pltpu.VMEM((C, E, W), jnp.bfloat16),
                            pltpu.VMEM((C, E, W), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        )(x, m0, m1, w0, w1)
    return run

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, Cin, Hp, W), jnp.bfloat16)
m0 = jnp.zeros((B, C, Hp, W), jnp.bfloat16)
m1 = jnp.zeros((B, C, Hp, W), jnp.bfloat16)
w0 = jax.random.normal(key, (C, 9*Cin), jnp.bfloat16) * 0.05
w1 = jax.random.normal(key, (C, 9*C), jnp.bfloat16) * 0.05
for variant in ("from_scratch", "h_chain"):
    try:
        out = build(variant)(x, m0, m1, w0, w1)
        _ = float(out[2].sum())
        print(f"{variant}: OK", flush=True)
    except Exception as e:
        print(f"{variant}: FAIL {repr(e)[:120]}", flush=True)
