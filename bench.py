"""Headline benchmark: LIFFireNet 256x256 eval throughput (windows/sec/chip).

Matches the BASELINE.md target: LIFFireNet (32ch) forward steps over
256x256 event-count windows, membrane state carried across windows.
North star: >= 5000 event-windows/sec/chip on TPU v5e.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Method: jit a ``lax.scan`` over T consecutive windows (the recurrent eval
loop, dispatch amortized) at batch B parallel sequences (the reference's
batch-slot semantics, one window per sequence per step); throughput counts
T*B windows. Uses bfloat16 conv compute with f32 LIF state — the deployment
configuration (see tests/test_quant.py for accuracy parity checks).
"""

import json
import time


def bench(B=8, H=256, W=256, T=64, channels=32, dtype="bfloat16", iters=5):
    import jax
    import jax.numpy as jnp

    from evflow.registry import build_model

    cfg = {
        "name": "LIFFireNet",
        "num_bins": 2,
        "base_num_channels": channels,
        "kernel_size": 3,
        "encoding": "cnt",
        "compute_dtype": dtype if dtype == "bfloat16" else None,
        "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
    }
    model = build_model(cfg)
    states = model.init_states(B, H, W)
    key = jax.random.PRNGKey(0)
    cnt0 = jnp.zeros((B, H, W, 2), jnp.float32)
    variables = model.init(key, None, cnt0, states)

    # realistic sparse event-count input (~5% active pixels)
    ks = jax.random.split(key, 2)
    dense = jax.random.poisson(ks[0], 0.05, (T, B, H, W, 2)).astype(jnp.float32)
    windows = dense

    def run(variables, windows, states):
        def step(st, cnt):
            out, new_st = model.apply(variables, None, cnt, st, train=False)
            return new_st, out["flow"][0]

        final, flows = jax.lax.scan(step, states, windows)
        return flows, final

    run_j = jax.jit(run)
    flows, st = run_j(variables, windows, states)
    jax.block_until_ready(flows)

    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        flows, st = run_j(variables, windows, st)
        jax.block_until_ready(flows)
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
