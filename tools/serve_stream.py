"""Streaming inference server demo: HDF5 event stream -> int8 engine.

End-to-end serving pipeline measurement — host HDF5 reads + encodings
(background Prefetcher) overlapping device inference on the int8
deployment engine — with per-window latency percentiles and a throughput
summary. The production analog of the reference's real-time eval loop
(eval_flow.py:208-343), restructured as a serving pipeline:

    python tools/serve_stream.py --config configs/eval_MVSEC.yml \
        [checkpoint] [--mem_dtype int8] [--windows 500] [--synthetic]

With --synthetic, a temporary synthetic sequence (known GT flow) is
generated so the demo runs without MVSEC data.
"""

import argparse
from functools import partial
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--config", default="configs/eval_MVSEC.yml")
    p.add_argument("--artifact", default=None,
                   help="serve from a save_engine .npz deploy artifact "
                        "instead of a checkpoint; if the artifact carries an "
                        "autotuned serving config (tools/autotune_serving.py "
                        "--save), its tier and chunk become the defaults")
    p.add_argument("--mem_dtype", default=None,
                   choices=["bfloat16", "int8", "mixed"],
                   help="membrane tier (default: the artifact's tier, else "
                        "bfloat16); incompatible with --artifact, whose "
                        "quantized parameters fix the tier")
    p.add_argument("--compute", default="hybrid",
                   choices=["bfloat16", "int8", "hybrid", "hybrid8"],
                   help="UNet engine only: conv compute tier (same integer "
                        "arithmetic; bf16 wins at <=128 res, s8 at 256)")
    p.add_argument("--phase_decoders", action="store_true",
                   help="UNet engine only: phase-decomposed decoders "
                        "(2.4x f32 serving; 1-2 px border divergence)")
    p.add_argument("--windows", type=int, default=200)
    p.add_argument("--chunk", type=int, default=None,
                   help="micro-batch K windows per device dispatch (one "
                        "lax.scan step); trades K windows of latency for "
                        "near-device-rate throughput on slow host links "
                        "(default: the artifact's tuned chunk capped at "
                        "--windows, else 1)")
    p.add_argument("--synthetic", action="store_true",
                   help="serve a generated synthetic sequence (no MVSEC needed)")
    p.add_argument("--resolution", type=int, default=128,
                   help="synthetic sequence resolution")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from evflow.config import load_config
    from evflow.data.h5_stream import H5EventStream, Prefetcher
    from evflow.deploy import Int8DeployEngine
    from evflow.registry import build_model

    config = load_config(args.config)
    if args.synthetic:
        import tempfile

        from evflow.data.synthetic import make_dataset

        root = tempfile.mkdtemp(prefix="serve_demo_")
        R = args.resolution
        make_dataset(root, num_sequences=1, resolution=(R, R),
                     events_per_sec=30_000 * (R // 32) ** 2, duration=4.0,
                     flows=[(12.0, -8.0)], gt_hz=30.0)
        config["data"]["path"] = root
        config["data"]["mode"] = "gtflow_dt1"
        config["data"]["window"] = 1
        config["loader"]["resolution"] = [R, R]
        config["loader"]["std_resolution"] = [R, R]
        config["loader"]["batch_size"] = 1
        config.setdefault("hot_filter", {})["enabled"] = False

    model_cfg = config["model"]
    model = build_model(model_cfg)
    H, W = config["loader"]["resolution"]
    B = int(config["loader"].get("batch_size", 1))
    if args.artifact and args.checkpoint:
        p.error("pass a checkpoint OR --artifact, not both (the artifact "
                "already contains the prepared parameters)")
    if not args.artifact:
        states0 = model.init_states(B, H, W)
        variables = model.init(
            jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states0
        )
    if args.checkpoint:
        from evflow.utils.checkpoint import import_torch_checkpoint, load_checkpoint

        if args.checkpoint.endswith((".pth", ".pt")):
            variables, _ = import_torch_checkpoint(args.checkpoint, variables)
        else:
            restored = load_checkpoint(
                args.checkpoint,
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {}),
                 "opt_state": None, "epoch": 0, "loss": 0.0, "loss_variance": 0.0},
            )
            variables = {"params": restored["params"],
                         "batch_stats": restored["batch_stats"]}

    is_unet = model.__class__.__name__ == "SpikingRecEVFlowNet"
    if args.artifact:
        if args.mem_dtype:
            p.error("--mem_dtype cannot override an artifact: its quantized "
                    "parameters fix the tier (re-save with autotune_serving)")
        if is_unet:
            from evflow.deploy_unet import Int8UNetEngine

            engine = Int8UNetEngine.from_artifact(model, args.artifact)
        else:
            engine = Int8DeployEngine.from_artifact(model, args.artifact)
        tuned = getattr(engine, "serving", None) or {}
    elif is_unet:
        from evflow.deploy_unet import Int8UNetEngine

        if args.mem_dtype and args.mem_dtype != "bfloat16":
            p.error("the UNet engine carries bf16 membranes")
        engine = Int8UNetEngine(model, variables, compute=args.compute,
                                phase_decoders=args.phase_decoders)
        tuned = {}
    else:
        # downsample pooling makes counts fractional in multiples of
        # 1/(ph*pw) — an input_scale of exactly that keeps the int8 input
        # grid EXACT (jnp.round(x/scale) recovers the integer pool sums)
        std_h, std_w = config["loader"].get("std_resolution",
                                            config["loader"]["resolution"])
        input_scale = 1.0
        if (std_h, std_w) != (H, W):
            input_scale = 1.0 / ((std_h // H) * (std_w // W))
        engine = Int8DeployEngine(model, variables,
                                  mem_dtype=args.mem_dtype or "bfloat16",
                                  input_scale=input_scale)
        tuned = {}
    if args.chunk is None:
        # the tuned chunk is the throughput-optimal dispatch; cap it at the
        # demo budget so at least one chunk fills
        args.chunk = min(int(tuned["chunk"]), max(1, args.windows)) \
            if tuned.get("chunk") else 1
        if tuned:
            print(f"serving config from artifact: tier {engine.mem_dtype}, "
                  f"chunk {args.chunk}"
                  + (f" (tuned {tuned['chunk']}, capped)" if
                     args.chunk != int(tuned["chunk"]) else ""), flush=True)
    # the tuned batch = streams packed per chip; B here is how many streams
    # the config actually feeds, so it is a recommendation, not an override
    # — but never let the mismatch pass silently
    if tuned.get("batch") and int(tuned["batch"]) != B:
        print(f"note: artifact's tuned throughput point is B={tuned['batch']} "
              f"streams/chip ({tuned.get('windows_per_s', '?')} win/s); this "
              f"config feeds B={B} — pack {tuned['batch']} sequences per chip "
              f"(loader.batch_size) to hit the measured optimum", flush=True)
    states = engine.init_states(B, H, W)

    # donate the state carry: membranes/spikes update in place instead of
    # double-buffering (same knob as bench.py round 5)
    @partial(jax.jit, donate_argnums=(2,))
    def step(params, cnt, st):
        out, st2 = engine.apply(params, None, cnt.astype(jnp.float32), st)
        return out["flow"][-1], st2

    @partial(jax.jit, donate_argnums=(2,))
    def chunk_step(params, cnts, st):
        """[K, B, H, W, 2] -> scan K engine steps in ONE dispatch."""

        def body(s, c):
            out, s2 = engine.apply(params, None, c.astype(jnp.float32), s)
            return s2, out["flow"][-1]

        st2, flows = jax.lax.scan(body, st, cnts)
        return flows, st2

    data = H5EventStream(config, model_cfg.get("num_bins", 2),
                         model_cfg.get("round_encoding", False))
    fetch = Prefetcher(data, depth=2)

    # compact uint16 wire only when counts are exact non-negative integers
    # (no downsample pooling, no signed temporal_cnt) — same guard as
    # evflow/eval.py's compact_wire
    loader = config["loader"]
    std_res = tuple(loader.get("std_resolution", loader["resolution"]))
    compact = (tuple(loader["resolution"]) == std_res
               and not bool(model_cfg.get("temporal_cnt", False)))

    # sticky wire dtype: uint8 until a window overflows it, then uint16 for
    # the rest of the stream (a per-window dtype would retrace the step)
    wire_dtype = np.uint8

    def wire(cnt_np):
        nonlocal wire_dtype
        if not compact:
            return jnp.asarray(cnt_np)
        if wire_dtype is np.uint8 and cnt_np.max() > 255:
            wire_dtype = np.uint16
        return jnp.asarray(cnt_np.astype(wire_dtype))

    K = max(1, int(args.chunk))
    # --windows rounds down to whole chunks in chunked mode
    budget = (args.windows // K) * K if K > 1 else args.windows

    # warm up (compile) on an all-zeros window with a THROWAWAY state (the
    # jitted steps donate their state argument, and the served flow
    # sequence must be identical for every chunk setting)
    first = next(fetch)
    zw = wire(np.zeros_like(first["event_cnt"]))
    warm_states = engine.init_states(B, H, W)
    if K == 1:
        flow, _ = step(engine.params, zw, warm_states)
    else:
        flows, _ = chunk_step(
            engine.params, jnp.broadcast_to(zw, (K, *zw.shape)), warm_states
        )
        flow = flows[-1]
    flow.block_until_ready(); float(jnp.sum(flow))

    import itertools

    stream = itertools.chain([first], fetch)
    lat = []
    t_start = time.perf_counter()
    served = 0
    dropped = 0  # trailing windows that didn't fill a chunk
    pending = None  # deferred fetch: overlap host wire with device compute
    try:
        chunk_buf = []
        while served < budget:
            batch = next(stream)
            if batch["epoch_done"]:
                break
            if K == 1:
                t0 = time.perf_counter()
                cnt = wire(batch["event_cnt"])
                flow, states = step(engine.params, cnt, states)
                if pending is not None:
                    float(pending)  # sync one step late
                pending = jnp.sum(flow)
                lat.append(time.perf_counter() - t0)
                served += 1
                continue
            chunk_buf.append(batch["event_cnt"])
            if len(chunk_buf) < K:
                continue
            t0 = time.perf_counter()
            cnts = wire(np.stack(chunk_buf))
            chunk_buf = []
            flows, states = chunk_step(engine.params, cnts, states)
            if pending is not None:
                float(pending)
            pending = jnp.sum(flows)
            lat.append(time.perf_counter() - t0)
            served += K
        dropped = len(chunk_buf)
        if pending is not None:
            float(pending)
    finally:
        fetch.close()

    wall = time.perf_counter() - t_start
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    tag = f" (chunks of {K})" if K > 1 else ""
    if dropped:
        tag += f"; {dropped} trailing windows did not fill a chunk"
    rate = served * B / wall if served else 0.0
    print(f"served {served} windows x B={B} in {wall:.2f}s "
          f"-> {rate:.1f} win/s end-to-end{tag}")
    if len(lat_ms):
        unit = "chunk" if K > 1 else "issue"
        print(f"{unit} latency ms: p50={np.percentile(lat_ms, 50):.2f} "
              f"p90={np.percentile(lat_ms, 90):.2f} "
              f"p99={np.percentile(lat_ms, 99):.2f} max={lat_ms[-1]:.2f}")
    print(f"engine: int8 weights (folded BN), membranes {engine.mem_dtype}, "
          f"model {model_cfg.get('name')} @ {H}x{W}")


if __name__ == "__main__":
    main()
