"""Long-stream serving soak: membrane stability over continuous streams.

Production serving runs ONE stream for hours with membrane state carried
across every window — nothing in the AEE protocol tests (a few hundred
windows) would catch slow membrane drift, bf16 accumulation pathologies,
or a quantized-state random walk. This harness streams a LONG synthetic
sequence (known GT flow) through the int8 deployment engine with state
carried continuously, and reports per-segment AEE plus membrane absmax
over time: a healthy engine shows flat segment AEE and bounded membranes
from the first segment to the last.

The reference has no analog (its eval loops are bounded by the MVSEC
files); this guards the serving mode evflow adds (tools/serve_stream.py,
chunked streaming).

Usage: python benchmarks/soak_serving.py [duration_s] [--mem int8|mixed|bfloat16]
       [--ckpt path]  (default: a fresh random-init model — drift is a
       property of the dynamics, not the weights)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from evflow.data.h5_stream import H5EventStream
from evflow.data.synthetic import make_dataset
from evflow.deploy import Int8DeployEngine
from evflow.registry import build_model

import argparse

_p = argparse.ArgumentParser(description=__doc__)
_p.add_argument("duration_s", nargs="?", type=float, default=30.0)
_p.add_argument("--mem", default="bfloat16",
                choices=["bfloat16", "int8", "mixed"])
_p.add_argument("--ckpt", default=None)
_a = _p.parse_args()
DUR, MEM, CKPT = _a.duration_s, _a.mem, _a.ckpt

R, FLOW = 64, (30.0, -20.0)
root = tempfile.mkdtemp(prefix="evflow_soak")
make_dataset(root, num_sequences=1, resolution=(R, R), events_per_sec=250_000,
             duration=DUR, flows=[FLOW], gt_hz=10.0,
             rate_mode="motion", rate_ref=36.0)

cfg = {
    "data": {"path": root, "mode": "gtflow_dt1", "window": 0.04},
    "model": {"name": "LIFFireNet_short", "encoding": "cnt",
              "num_bins": 2, "base_num_channels": 16, "kernel_size": 3,
              "mask_output": True},
    "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
    "loader": {"n_epochs": 1, "batch_size": 1, "resolution": [R, R],
               "std_resolution": [R, R], "augment": [], "seed": 0},
    "hot_filter": {"enabled": False}, "vis": {"bars": False},
}
model = build_model(cfg["model"])
variables = model.init(jax.random.PRNGKey(0), None,
                       jnp.zeros((1, R, R, 2)), model.init_states(1, R, R))
if CKPT:
    from evflow.utils.checkpoint import load_checkpoint

    restored = load_checkpoint(CKPT, {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": None, "epoch": 0, "loss": 0.0, "loss_variance": 0.0})
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}
engine = Int8DeployEngine(model, variables, mem_dtype=MEM)

K = 64  # windows per device dispatch


def chunk_step(params, cnts, st):
    def body(s, c):
        out, s2 = engine.apply(params, None, c, s)
        return s2, out["flow"][0]

    st2, flows = jax.lax.scan(body, st, cnts)
    absmax = jnp.max(jnp.stack(
        [jnp.max(jnp.abs(s.mem.astype(jnp.float32))) for s in st2]))
    return flows, st2, absmax


chunk_j = jax.jit(chunk_step, donate_argnums=(2,))

stream = H5EventStream(cfg, 2)
st = engine.init_states(1, R, R)
seg_err, seg_n, segs, mems = 0.0, 0, [], []
done = 0
buf_c, buf_g, buf_d = [], [], []
SEG = None
try:
    while True:
        b = stream.next_batch()
        if b["epoch_done"]:
            break
        buf_c.append(b["event_cnt"])
        buf_g.append(b.get("gtflow"))
        buf_d.append((float(b["dt_gt"][0]), float(b["dt_input"][0])))
        if len(buf_c) < K:
            continue
        cnts = jnp.asarray(np.stack(buf_c), jnp.float32)
        flows, st, absmax = chunk_j(engine.params, cnts, st)
        flows = np.asarray(flows)
        mems.append(float(absmax))
        for i in range(K):
            gt, (dt_gt, dt_in) = buf_g[i], buf_d[i]
            if gt is None or dt_gt <= 0 or dt_in <= 0:
                continue
            f = flows[i][0] * R * dt_gt / dt_in  # flow_scaling = R
            err = np.hypot(f[..., 0] - gt[0][..., 0], f[..., 1] - gt[0][..., 1])
            seg_err += float(err.mean()); seg_n += 1
        done += K
        buf_c, buf_g, buf_d = [], [], []
        if SEG is None:
            SEG = max(1, int(np.ceil(DUR * 10 / 10 / 0.04 / K)))  # ~10 segments
        if len(mems) % SEG == 0 and seg_n:
            segs.append(seg_err / seg_n)
            seg_err, seg_n = 0.0, 0
finally:
    stream.close()
if seg_n:
    segs.append(seg_err / seg_n)

print(f"soak: {done} windows, {DUR:.0f}s stream, mem_dtype={MEM}, "
      f"ckpt={'yes' if CKPT else 'random-init'}")
print("segment AEE:", " ".join(f"{s:.3f}" for s in segs))
print(f"membrane absmax per chunk: first={mems[0]:.2f} "
      f"max={max(mems):.2f} last={mems[-1]:.2f}")
drift = (segs[-1] - segs[0]) / max(segs[0], 1e-9) if len(segs) > 1 else 0.0
print(f"AEE drift first->last segment: {100 * drift:+.2f}%")
bounded = max(mems) < 10 * max(mems[0], 1.0)
print("membranes bounded:", bounded)
