"""Device-resident training-step throughput: conv_impl variants.

Isolates the jitted TBPTT train step (window pre-staged on device, no host
wire) at the reference train config scale — the number that binds on a
normally-attached host (the end-to-end loop on THIS tunneled rig is
wire-bound at ~60 MB/s, see BENCH_NOTES.md round 1)."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from evflow.loss.warp_loss import EventWarpingConfig
from evflow.registry import build_model, build_optimizer
from evflow.train import make_train_step, stack_window

import os
B, H, W = 8, 128, 128
B = int(os.environ.get("EVB", B))  # round-6: batch-residency sweep
P, N = 10, 1000  # passes per loss window, events per window


VOXEL = os.environ.get("EVVOXEL", "0") == "1"  # voxel-encoding wire variant
NB = 5 if VOXEL else 2
# EVMODEL=unet trains the second flagship (SpikingRecEVFlowNet, C=32 —
# the reference scale) instead of LIFFireNet_short
UNET = os.environ.get("EVMODEL", "") == "unet"


def bench(conv_impl, compute_dtype=None, iters=4):
    if UNET:
        cfg = {
            "name": "SpikingRecEVFlowNet", "num_bins": NB,
            "base_num_channels": 32, "kernel_size": 3,
            "encoding": "voxel" if VOXEL else "cnt", "mask_output": True,
            "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.0]},
        }
    else:
        cfg = {
            "name": "LIFFireNet_short", "num_bins": NB, "base_num_channels": 8,
            "kernel_size": 3, "encoding": "voxel" if VOXEL else "cnt",
            "conv_impl": conv_impl,
            "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
        }
    if compute_dtype:
        cfg["compute_dtype"] = compute_dtype
    model = build_model(cfg)
    states = model.init_states(B, H, W)
    x0 = jnp.zeros((B, H, W, NB), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           x0 if VOXEL else None,
                           None if VOXEL else x0, states)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     build_optimizer({"name": "Adam", "lr": 2e-4}))
    opt_state = tx.init(variables["params"])
    warp_cfg = EventWarpingConfig({
        "loader": {"resolution": [H, W]},
        "loss": {"flow_regul_weight": 0.001},
        "model": {"mask_output": True},
    })
    derive = os.environ.get("EVDERIVE", "0") == "1"
    step_fn = make_train_step(model, tx, warp_cfg,
                              remat=os.environ.get("EVREMAT", "full"),
                              resolution=(H, W),
                              num_bins=NB if (VOXEL and derive) else None)

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(P):
        ys = rng.integers(0, H, (B, N)).astype(np.float32)
        xs = rng.integers(0, W, (B, N)).astype(np.float32)
        ts = np.sort(rng.uniform(0, 1, (B, N)), axis=1).astype(np.float32)
        ps = rng.choice([-1.0, 1.0], (B, N)).astype(np.float32)
        cnt = rng.poisson(0.1, (B, H, W, 2)).astype(np.float32)
        vox = rng.normal(0, 0.3, (B, H, W, NB)).astype(np.float32)
        batches.append({
            "event_list": np.stack([ts, ys, xs, ps], -1),
            "event_list_pol_mask": np.stack(
                [(ps > 0).astype(np.float32), (ps < 0).astype(np.float32)], -1),
            "event_valid": np.ones((B, N), np.float32),
            "event_cnt": cnt, "event_voxel": vox,
            "event_mask": (cnt.sum(-1, keepdims=True) > 0).astype(np.float32),
        })
    window = stack_window(batches)
    if derive:
        # derive wire: grids rebuilt on device from the event list
        # (timing-only here: the synthetic grids are not the list's
        # histogram/splat); EVPACK adds the packed event wire (u16 coords,
        # 1-bit polarity, lengths) on top; EVVOXEL times the voxel-family
        # scatter (num_bins channels) instead of the cnt histogram
        from evflow.train import compact_window
        pack = os.environ.get("EVPACK", "0") == "1"
        window = compact_window(
            window, "voxel" if VOXEL else "cnt", derive_mask=True,
            derive_cnt=not VOXEL, derive_voxel=VOXEL,
            coords_dtype=np.uint16 if pack else None, pol_bits=pack)
    window = jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None, window)

    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    loss, params, bstats, opt_state, states, _ = step_fn(
        params, bstats, opt_state, states, window)
    t0 = time.time(); float(loss); cs = time.time() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        loss, params, bstats, opt_state, states, _ = step_fn(
            params, bstats, opt_state, states, window)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    tag = f"{conv_impl}{'+' + compute_dtype if compute_dtype else ''}"
    print(f"train device step {tag:16s}: {P*B/best:.0f} win/s ({best*1e3:.1f} ms/step)",
          flush=True)

    # the single-step number above still carries the per-dispatch+fetch
    # roundtrip (~35 ms on this tunneled rig — profile_train.py measured
    # 54 ms device vs 84+ ms wall); scanning S optimizer steps in one
    # dispatch reports the pure device rate
    S = 8

    @jax.jit
    def multi(params, bstats, opt_state, states, window):
        def body(carry, _):
            p, bs, opt, st = carry
            # jit-of-jit inlines; inner donation is ignored under trace
            loss, p, bs, opt, st, _ = step_fn(p, bs, opt, st, window)
            return (p, bs, opt, st), loss

        (params, bstats, opt_state, states), losses = jax.lax.scan(
            body, (params, bstats, opt_state, states), None, length=S)
        return params, bstats, opt_state, states, losses.sum()

    out = multi(params, bstats, opt_state, states, window)
    float(out[-1])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = multi(*out[:4], window)
        float(out[-1])
        best = min(best, time.perf_counter() - t0)
    print(f"train device step {tag:16s}: {S*P*B/best:.0f} win/s pure-device "
          f"({best/S*1e3:.1f} ms/step, {S} steps/dispatch)", flush=True)


if __name__ == "__main__":
    only = os.environ.get("EVIMPL")  # e.g. "dypack+bfloat16" for B sweeps
    for impl, dt in [("im2col", None), ("dypack", None), ("dypack", "bfloat16")]:
        tag = f"{impl}{'+' + dt if dt else ''}"
        if only and tag != only:
            continue
        bench(impl, dt)
