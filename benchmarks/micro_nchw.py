import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

B,H,W,C,T = 8,256,256,32,16
key = jax.random.PRNGKey(0)

def timeit(fn, *args, iters=3, label=""):
    out = fn(*args); _=float(jax.tree.leaves(out)[0].sum())
    best=1e9
    for _ in range(iters):
        t0=time.perf_counter(); out = fn(*args); _=float(jax.tree.leaves(out)[0].sum())
        best=min(best, time.perf_counter()-t0)
    print(f"{label}: {best*1e3:.2f} ms -> {T*B/best:.0f} win/s", flush=True)
    return best

# a) NCHW conv chain + LIF (bf16 states)
x = jax.random.normal(key, (B,C,H,W), jnp.bfloat16)
ks = [jax.random.normal(jax.random.PRNGKey(i), (C,C,3,3), jnp.bfloat16) for i in range(9)]
beta = jnp.bfloat16(0.5); theta = jnp.bfloat16(0.5)
@jax.jit
def nchw_conv(x, ks):
    def step(carry, _):
        mems = carry
        h = x
        new=[]
        for k, mem in zip(ks, mems):
            ff = jax.lax.conv_general_dilated(h, k, (1,1), "SAME",
                dimension_numbers=("NCHW","OIHW","NCHW"),
                preferred_element_type=jnp.bfloat16)
            u = beta*mem + ff
            spk = (u > theta).astype(jnp.bfloat16)
            new.append(u*(1-spk)); h = spk
        return tuple(new), h.sum()
    mems0 = tuple(jnp.zeros((B,C,H,W), jnp.bfloat16) for _ in range(9))
    _, s = jax.lax.scan(step, mems0, None, length=T)
    return s.sum()
timeit(nchw_conv, x, ks, label="NCHW lax.conv chain")

# b) NCHW shift-stack big matmul chain + LIF
wms = [k.transpose(0,1,2,3).reshape(C, C*9).transpose(1,0) for k in ks]  # placeholder; build properly below
def build_wm(k):  # k [O,I,3,3] -> [9I, O] ordered (dy,dx,I)
    # w[dy,dx,i,o]
    kt = k.transpose(2,3,1,0)  # [3,3,I,O]
    return kt.reshape(9*C, C)
wms = [build_wm(k) for k in ks]

def shift_stack(h):  # h [B,C,H,W] -> [B,9C,H,W] zero-padded shifts
    hp = jnp.pad(h, ((0,0),(0,0),(1,1),(1,1)))
    parts = [hp[:, :, dy:dy+H, dx:dx+W] for dy in range(3) for dx in range(3)]
    return jnp.concatenate(parts, axis=1)

@jax.jit
def nchw_matmul(x, wms):
    def step(carry, _):
        mems = carry
        h = x
        new=[]
        for wm, mem in zip(wms, mems):
            ss = shift_stack(h).reshape(B, 9*C, H*W)
            ff = jnp.einsum("ko,bkn->bon", wm.astype(jnp.bfloat16), ss,
                            preferred_element_type=jnp.bfloat16).reshape(B,C,H,W)
            u = beta*mem + ff
            spk = (u > theta).astype(jnp.bfloat16)
            new.append(u*(1-spk)); h = spk
        return tuple(new), h.sum()
    mems0 = tuple(jnp.zeros((B,C,H,W), jnp.bfloat16) for _ in range(9))
    _, s = jax.lax.scan(step, mems0, None, length=T)
    return s.sum()
timeit(nchw_matmul, x, wms, label="NCHW shift-stack matmul chain")
