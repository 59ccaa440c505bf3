"""Dump the compiled HLO of the bench step and print the instructions inside
the hot fusions identified by profile_bench.py (clamp_convert_fusion.*,
convolution_multiply_fusion.*, fusion.16x/17x, pad_slice_fusion.*).

Run: python benchmarks/dump_bench_hlo.py [/tmp/bench_hlo.txt]
"""
import sys; sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from evflow.deploy import Int8DeployEngine
from evflow.registry import build_model

B, H, W, T = 8, 256, 256, 64
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_hlo.txt"

cfg = {
    "name": "LIFFireNet", "num_bins": 2, "base_num_channels": 32,
    "kernel_size": 3, "encoding": "cnt",
    "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
}
model = build_model(cfg)
states = model.init_states(B, H, W)
key = jax.random.PRNGKey(0)
variables = model.init(key, None, jnp.zeros((B, H, W, 2), jnp.float32), states)
engine = Int8DeployEngine(model, variables, mem_dtype="mixed")
est = engine.init_states(B, H, W)
window = jax.random.poisson(key, 0.05, (B, H, W, 2)).astype(jnp.float32)


def run(params, window, states):
    def step(st, _):
        out, new_st = engine.apply(params, None, window, st)
        return new_st, out["flow"][0].sum()

    final, fsum = jax.lax.scan(step, states, None, length=T)
    return fsum.sum(), final


compiled = jax.jit(run).lower(engine.params, window, est).compile()
txt = compiled.as_text()
with open(OUT, "w") as f:
    f.write(txt)
print(f"wrote {len(txt)} chars to {OUT}")

# print each fusion computation's body op kinds + shapes, compactly
import re

lines = txt.splitlines()
print("\n=== fusion roots (instruction name -> called computation) ===")
for ln in lines:
    m = re.search(r"(\S*fusion\S*) = (\S+) fusion\((.*)\), kind=(\S+), calls=(\S+)", ln)
    if m:
        print(f"{m.group(1)[:48]:48s} {m.group(2)[:40]:40s} kind={m.group(4)} calls={m.group(5)}")
