"""Headline benchmark: LIFFireNet 256x256 eval throughput (windows/sec/chip).

BASELINE.md target: >= 5000 event-windows/sec/chip on TPU v5e with AEE
within 1% of reference. The model is LIFFireNet 32ch; one window = one
forward step of one 256x256 sequence with membrane state carried across
windows. Batch B parallel sequences (the reference's batch-slot semantics)
x a jitted lax.scan over T consecutive windows; throughput counts T*B
windows.

Measured configuration: the int8 deployment engine (evflow/deploy.py) —
folded BN, hoisted per-channel int8 weights, int8 spike carries, real int8
MXU GEMMs in the dy-packed formulation, mixed membrane carries (bf16 head
membrane, profiled-asymmetric int8 everywhere else). This is the serving
path a user deploys (eval_flow_quant.py --mode deploy --mem_dtype mixed);
its accuracy is evidenced by tests/test_deploy.py and
benchmarks/deploy_aee_tiers.py: the head unit is the sole source of the
int8-membrane AEE penalty, and the mixed tier holds AEE within 0.12% of
the f32 path over ~230 windows of the full gtflow protocol. See
BENCH_NOTES.md rounds 3-4 for the tier study (bf16 membranes: 2089 win/s
at 0.03%; full-int8 membranes: 2407 at ~1.1-1.5%).

Timing note: on the tunneled axon backend ``block_until_ready`` does not
synchronize — a scalar fetch does, so we reduce the flows inside the scan
and fetch the result. Each dispatch+fetch roundtrip carries ~35 ms of
fixed wire/relay overhead on this rig (fit from the T=64 vs T=256 scaling,
BENCH_NOTES.md round 5) — the long scan amortizes it to <0.01 ms/window so
the scored number tracks the device step, which is what a normally-attached
host observes; state buffers are donated (the carry updates in place).

Shape note (round-6 sweep, BENCH_NOTES.md): B=8 was optimal only while the
per-dispatch wire tax dominated (T=64). With the tax amortized, smaller
batches run FASTER per window — the B=8 working set (two s8[8,256,256,192]
cols buffers per dual unit) thrashes what the HBM scheduler streams
cleanly, while B=2 stays resident: measured 3621 (B=2) vs 3546 (B=4) vs
~2740 (B=8) device-equivalent win/s at T=4096; B=1 loses latency hiding
(3515) and T=8192 adds +0.7% (3650, shipped). Serving more streams than
fits one engine is the multi-chip fan-out's job (evaluate(mesh=...)), not
a bigger B.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

MEM_DTYPE = "bfloat16"  # best-accuracy tier (+0.03% AEE) AND fastest at B=2
# (round-6 flip: int8-membrane quant arithmetic cost more than its bytes
# saved once the B=2 working set became resident — 4256 bf16 vs 3647 mixed
# vs 3540 int8 win/s; at B=8 the ordering was reversed. BENCH_NOTES.md.)


def bench(B=2, H=256, W=256, T=16384, channels=32, iters=8, mem_dtype=MEM_DTYPE):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from evflow.deploy import Int8DeployEngine
    from evflow.registry import build_model

    cfg = {
        "name": "LIFFireNet",
        "num_bins": 2,
        "base_num_channels": channels,
        "kernel_size": 3,
        "encoding": "cnt",
        "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
    }
    model = build_model(cfg)
    states = model.init_states(B, H, W)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, None, jnp.zeros((B, H, W, 2), jnp.float32), states)
    engine = Int8DeployEngine(model, variables, mem_dtype=mem_dtype)
    est = engine.init_states(B, H, W)
    # realistic sparse event-count input (~5% active pixels), reused each step
    window = jax.random.poisson(key, 0.05, (B, H, W, 2)).astype(jnp.float32)

    def run(params, window, states):
        def step(st, _):
            out, new_st = engine.apply(params, None, window, st)
            return new_st, out["flow"][0].sum()

        final, fsum = jax.lax.scan(step, states, None, length=T)
        return fsum.sum(), final

    run_j = jax.jit(run, donate_argnums=(2,))
    s, st = run_j(engine.params, window, est)
    float(s)  # force full execution (compile + run)

    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        s, st = run_j(engine.params, window, st)
        float(s)
        best = min(best, time.perf_counter() - t0)
    return (T * B) / best


def main():
    value = bench()
    baseline = 5000.0  # BASELINE.md north-star windows/sec/chip
    print(
        json.dumps(
            {
                "metric": "LIFFireNet 256x256 eval throughput",
                "value": round(value, 1),
                "unit": "event-windows/sec/chip",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
