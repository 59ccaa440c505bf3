"""XLA compiler-option sweep on the shipped bench program (B=2, bf16 tier).

The per-program formulation matrix is fully measured (ROOFLINE.md §2); the
one untested axis is the compiler itself. jax.jit(...).lower(...).compile(
compiler_options=...) ships per-executable XLA flags through the remote
compiler. Candidates chosen for a traffic-bound elementwise+GEMM pipeline:

  - xla_tpu_scoped_vmem_limit_kib: larger scoped VMEM lets fusions hold
    bigger tiles resident (the B=2 win was a working-set effect).
  - xla_tpu_enable_latency_hiding_scheduler: overlap DMA with compute
    across the scan body.
  - xla_tpu_enable_aggressive_loop_fusion_layout_opt: layout assignment
    across the while-loop body.

Unknown/rejected options are caught and reported, not fatal. Each new
option set is a fresh remote compile (~minutes, then cached).

Run: python benchmarks/probe_xla_options.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from evflow.deploy import Int8DeployEngine
from evflow.registry import build_model

B, H, W, T = 2, 256, 256, 2048
C = 32

cfg = {
    "name": "LIFFireNet", "num_bins": 2, "base_num_channels": C,
    "kernel_size": 3, "encoding": "cnt",
    "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
}
model = build_model(cfg)
key = jax.random.PRNGKey(0)
variables = model.init(
    key, None, jnp.zeros((B, H, W, 2), jnp.float32), model.init_states(B, H, W)
)
engine = Int8DeployEngine(model, variables, mem_dtype="bfloat16")
window = jax.random.poisson(key, 0.05, (B, H, W, 2)).astype(jnp.float32)


def run(params, window, states):
    def step(st, _):
        out, new_st = engine.apply(params, None, window, st)
        return new_st, out["flow"][0].sum()

    final, fsum = jax.lax.scan(step, states, None, length=T)
    return fsum.sum(), final


OPTION_SETS = [
    ("control", {}),
    ("vmem64M", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96M", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("lhs_off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("lhs_on", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("loopfuse", {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
]


def bench_one(name, opts, iters=6):
    lowered = jax.jit(run, donate_argnums=(2,)).lower(
        engine.params, window, engine.init_states(B, H, W)
    )
    try:
        t0 = time.time()
        compiled = lowered.compile(compiler_options=opts or None)
        cs = time.time() - t0
    except Exception as e:  # unknown flag / backend rejection
        print(f"{name}: REJECTED ({type(e).__name__}: {str(e)[:120]})", flush=True)
        return
    st = engine.init_states(B, H, W)
    s, st = compiled(engine.params, window, st)
    float(s)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        s, st = compiled(engine.params, window, st)
        float(s)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: compile {cs:.0f}s, {best / T * 1e3:.3f} ms/win -> "
          f"{T * B / best:.0f} win/s", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or [n for n, _ in OPTION_SETS]
    for n, o in OPTION_SETS:
        if n in names:
            bench_one(n, o)
