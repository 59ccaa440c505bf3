"""Serving throughput of the UNet int8 engine vs the f32 flax model.

SpikingRecEVFlowNet (reference models/model.py:723-858) on the real chip:
one window = one forward step with carried state, jitted lax.scan over T
windows, donated carries, scalar fetch to synchronize (block_until_ready
does not synchronize on the tunneled axon backend — CLAUDE.md).

Usage: python benchmarks/bench_unet_deploy.py [--res 256] [--channels 32]
       [--batch 1] [--T 1024] [--what engine|f32|both]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--T", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--what", default="both", choices=["engine", "f32", "both"])
    ap.add_argument("--compute", default="hybrid", choices=["bfloat16", "int8", "hybrid", "hybrid8"],
                    help="engine conv compute tier (same integer arithmetic)")
    ap.add_argument("--phase", action="store_true",
                    help="phase-decomposed decoders (bilinear folded into "
                         "4 low-res kernels; 1-2 px border divergence)")
    ap.add_argument("--dypack_min_spatial", type=int, default=128,
                    help="hybrid tiers: stride-1 convs with input spatial "
                         ">= this ride the dy-pack s8 cols GEMM")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from evflow.deploy_unet import Int8UNetEngine
    from evflow.registry import build_model

    B, H, W, T = args.batch, args.res, args.res, args.T
    cfg = {
        "name": "SpikingRecEVFlowNet",
        "num_bins": 2,
        "base_num_channels": args.channels,
        "kernel_size": 3,
        "encoding": "cnt",
        "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.0]},
    }
    model = build_model(cfg)
    states = model.init_states(B, H, W)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, None, jnp.zeros((B, H, W, 2), jnp.float32), states)
    window = jax.random.poisson(key, 0.05, (B, H, W, 2)).astype(jnp.float32)

    def measure(apply_fn, params, init_states):
        def step(st, _):
            out, new_st = apply_fn(params, None, window, st)
            return new_st, out["flow"][-1].sum()

        def run(params, states):
            final, fsum = jax.lax.scan(step, states, None, length=T)
            return fsum.sum(), final

        run_j = jax.jit(run, donate_argnums=(1,))
        t0 = time.perf_counter()
        s, st = run_j(params, init_states)
        float(s)
        print(f"  compile+first: {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            s, st = run_j(params, st)
            float(s)
            best = min(best, time.perf_counter() - t0)
        return (T * B) / best

    if args.what in ("engine", "both"):
        engine = Int8UNetEngine(model, variables, compute=args.compute,
                                phase_decoders=args.phase,
                                dypack_min_spatial=args.dypack_min_spatial)
        v = measure(engine.apply, engine.params, engine.init_states(B, H, W))
        print(f"int8 engine ({args.compute}{'+phase' if args.phase else ''}): "
              f"{v:.1f} win/s  (B={B} {H}x{W} C={args.channels})")
    if args.what in ("f32", "both"):
        def f32_apply(params, ev, cnt, st):
            return model.apply(params, ev, cnt, st, train=False)

        v = measure(f32_apply, variables, model.init_states(B, H, W))
        print(f"f32 model:   {v:.1f} win/s  (B={B} {H}x{W} C={args.channels})")


if __name__ == "__main__":
    main()
