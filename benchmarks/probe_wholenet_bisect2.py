import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from benchmarks.pallas_archive.fused_net import fused_firenet_step

B, H, W, C, TH = 2, 64, 256, 32, 16
Hp = H + 2 * TH

def trial(name, layer_recs, Cin=2):
    n = len(layer_recs)
    slots = []
    s = 0
    for r in layer_recs:
        slots.append(s if r else -1)
        if r: s += 1
    key = jax.random.PRNGKey(0)
    x_pad = jax.random.normal(key, (B, Cin, Hp, W), jnp.bfloat16)
    mems = tuple(jnp.zeros((B, C, Hp, W), jnp.bfloat16) for _ in range(n))
    spks = tuple(jnp.zeros((B, C, Hp, W), jnp.bfloat16) for _ in range(s))
    ws = []
    for l, r in enumerate(layer_recs):
        cin = Cin if l == 0 else C
        k = 9 * cin + (9 * C if r else 0)
        ws.append(jax.random.normal(jax.random.PRNGKey(l), (C, k), jnp.bfloat16) * 0.05)
    params = tuple(jnp.ones((C, 3), jnp.float32) * 0.5 for _ in range(n))
    pw = jax.random.normal(key, (2, C), jnp.bfloat16) * 0.05
    pb = jnp.zeros((2, 1), jnp.float32)
    try:
        flow, m2, s2 = fused_firenet_step(
            x_pad, mems, spks, tuple(ws), params, pw, pb,
            recurrent_slots=tuple(slots), tile_rows=TH)
        _ = float(flow.sum())
        print(f"{name}: OK", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {repr(e)[:130]}", flush=True)
        return False

trial("1 ff", [False])
trial("2 ff", [False, False])
trial("1ff+1rec", [False, True])
trial("7 ff", [False]*7)
trial("full (2 rec)", [False, True, False, False, True, False, False])
