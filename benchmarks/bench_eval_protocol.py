"""Protocol-level throughput: full evaluate(chunk=K) wall win/s at 256².

The scored bench (bench.py) times the int8 engine's device scan; this
measures the COMPLETE gtflow evaluation protocol end-to-end on this rig —
host HDF5 streaming + encoding, chunked device dispatch (~35 ms tunnel
roundtrip per dispatch), flow fetches, host-side metric association,
AEE/AAE, heatmap accumulation — so the protocol number is always
reported next to the engine number (round-5 verdict item 6).

Run: python benchmarks/bench_eval_protocol.py [--windows 192]
"""
import sys; sys.path.insert(0, "/root/repo")
import os
import tempfile
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from evflow.config import combine_entries
from evflow.data.synthetic import make_dataset
from evflow.eval import evaluate

RES = 256
N_WINDOWS = int(sys.argv[sys.argv.index("--windows") + 1]) if "--windows" in sys.argv else 192

root = os.path.join(tempfile.gettempdir(), "evflow_proto_bench256")
if not os.path.isdir(root):
    # ~10 s sequence at 25 GT Hz -> 250 GT windows of ~20k events each
    make_dataset(root, num_sequences=1, resolution=(RES, RES),
                 events_per_sec=500_000, duration=10.0, flows=[(40.0, -25.0)],
                 gt_hz=25.0)

cfg = {
    "data": {"path": root, "mode": "gtflow_dt1", "window": 1},
    # the scored bench's model config (LIFFireNet 32ch, cnt encoding)
    "model": {"name": "LIFFireNet", "encoding": "cnt", "num_bins": 2,
              "base_num_channels": 32, "kernel_size": 3},
    "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
    "loader": {"batch_size": 1, "resolution": [RES, RES],
               "std_resolution": [RES, RES], "augment": [], "seed": 0,
               "event_cache_bytes": 512 * 1024 * 1024},
    "metrics": {"name": ["AEE", "AAE"], "flow_scaling": RES},
    "vis": {"bars": False},
    "hot_filter": {"enabled": False},
}
cfg = combine_entries(cfg)

for chunk, dev_metrics in ((16, False), (64, False), (16, True), (64, True)):
    t0 = time.perf_counter()
    res = evaluate(cfg, checkpoint=None, debug=True, verbose=False,
                   max_windows=N_WINDOWS, chunk=chunk,
                   device_metrics=dev_metrics)
    dt = time.perf_counter() - t0
    aee = {k: round(float(v), 4) for k, v in res["AEE"].items()}
    tag = " device_metrics" if dev_metrics else ""
    print(f"chunk={chunk:3d}{tag}: {N_WINDOWS / dt:7.1f} win/s wall over "
          f"{N_WINDOWS} windows ({dt:.1f} s)  AEE={aee}", flush=True)
