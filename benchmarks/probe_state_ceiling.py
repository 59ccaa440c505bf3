import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B,H,W,C,T = 8,256,256,32,32
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B,H,W,C), jnp.bfloat16)

# ceiling probe: per step, touch 7 mem + 2 spk arrays (read+write) with
# trivial elementwise work — the irreducible traffic of a fully fused step
@jax.jit
def run(x, states):
    def step(carry, _):
        new = tuple(jnp.tanh(s * jnp.bfloat16(0.99)) + x * jnp.bfloat16(0.01) for s in carry)
        return new, new[0].sum()
    fin, s = jax.lax.scan(step, states, None, length=T)
    return s.sum()

states = tuple(jnp.zeros((B,H,W,C), jnp.bfloat16) for _ in range(9))
t0=time.time(); s = run(x, states); _=float(s)
print(f"compile {time.time()-t0:.0f}s", flush=True)
best=1e9
for _ in range(3):
    t0=time.perf_counter(); s = run(x, states); _=float(s)
    best=min(best, time.perf_counter()-t0)
gb = 9*2*B*H*W*C*2/1e9 * T
print(f"state-ceiling: {best*1e3:.1f} ms -> {T*B/best:.0f} win/s ({gb/best:.0f} GB/s effective)", flush=True)
