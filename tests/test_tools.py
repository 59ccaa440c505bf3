"""Analysis tools + visualization smoke tests (SURVEY §2 L7 / §5.1)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evflow.analysis import VoltageProfiler, analyze_model, contrast_heatmap
from evflow.utils import viz


def test_contrast_heatmap_peaks_at_true_flow():
    """demo_iwe sanity: contrast maximal at the true flow."""
    rng = np.random.default_rng(0)
    N, H, W = 400, 32, 32
    v = 4.0
    t = rng.uniform(0, 1, N).astype(np.float32)
    y = rng.integers(4, 28, N).astype(np.float32)
    x = np.clip(rng.integers(2, 24, N) + v * t, 0, W - 1).astype(np.float32)
    events = np.stack([t, y, x, np.ones_like(t)], -1)
    heat = contrast_heatmap(events, (H, W), flow_range=(-0.5, 0.5), steps=5,
                            flow_scaling=8.0)
    # true flow = +4 px / (scaling 8) = 0.5 -> rightmost column, middle row
    i, j = np.unravel_index(np.argmax(heat), heat.shape)
    assert j == 4 and i == 2


def test_voltage_profiler(rng):
    from evflow.ops.lif import LIFState

    prof = VoltageProfiler(["head", "G1"])
    for _ in range(3):
        states = tuple(
            LIFState(jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32)),
                     jnp.asarray((rng.uniform(size=(1, 4, 4, 2)) > 0.5).astype(np.float32)))
            for _ in range(2)
        )
        prof.update(states)
    rep = prof.report()
    assert set(rep) == {"head", "G1"}
    r = rep["head"]
    assert r["mem_min"] <= r["mem_mean"] <= r["mem_max"]
    assert 0 <= r["spike_rate"] <= 1
    assert r["total_neurons"] == 32
    prof.print_table()


def test_analyze_model(tmp_path):
    from evflow.data.h5_stream import H5EventStream
    from evflow.data.synthetic import make_dataset
    from evflow.registry import build_model

    root = str(tmp_path / "d")
    make_dataset(root, num_sequences=1, resolution=(32, 32), events_per_sec=20000,
                 duration=0.3, flows=[(8.0, 0.0)])
    cfg = {
        "data": {"path": root, "mode": "events", "window": 500},
        "loader": {"resolution": [32, 32], "std_resolution": [32, 32],
                   "batch_size": 1, "augment": [], "seed": 0},
        "hot_filter": {"enabled": False}, "vis": {"bars": False},
    }
    model = build_model({"name": "LIFFireNet_short", "num_bins": 2,
                         "base_num_channels": 8, "kernel_size": 3, "encoding": "cnt",
                         "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}})
    states = model.init_states(1, 32, 32)
    v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((1, 32, 32, 2)), states)
    stream = H5EventStream(cfg, 2)
    prof = analyze_model(model, v, stream, num_batches=3, verbose=False)
    stream.close()
    assert prof.steps == 3

    # synaptic-operation accounting from the measured activity
    from evflow.analysis import ops_report

    rep = ops_report(model, 32, 32, activity=prof.report(),
                     input_density=0.1, verbose=False)
    C, hw, k2 = 8, 32 * 32, 9
    names = list(model.unit_names)
    # head: 2->C conv; G1 (recurrent): C->C ff + C->C rec; pred: 1x1 C->2
    assert rep["units"]["head"]["dense_macs"] == hw * k2 * 2 * C
    assert rep["units"]["G1"]["dense_macs"] == 2 * hw * k2 * C * C
    assert rep["units"]["pred"]["dense_macs"] == hw * C * 2
    assert rep["dense_macs_per_window"] == sum(
        u["dense_macs"] for u in rep["units"].values()
    )
    # head effective ops gate on the given input density exactly
    assert rep["units"]["head"]["effective_ops"] == (
        rep["units"]["head"]["dense_macs"] * 0.1
    )
    # every gate is a valid activity fraction and the speedup is consistent
    for name, u in rep["units"].items():
        assert 0.0 <= u["effective_ops"] <= u["dense_macs"]
    assert rep["sparsity_speedup"] == (
        rep["dense_macs_per_window"] / rep["effective_ops_per_window"]
    )
    # without activity, only dense counts
    rep2 = ops_report(model, 32, 32, verbose=False)
    assert rep2["effective_ops_per_window"] is None
    assert rep2["dense_macs_per_window"] == rep["dense_macs_per_window"]


def test_analyze_model_unet(tmp_path):
    """VoltageProfiler + ops accounting cover the UNet flagship: per-cell
    membrane/spike stats are computed from the flat state pytree keyed by
    the model's unit_names, and ops_report walks the encoder/resblock/
    decoder channel plan (measured gates where the conv input is a spike
    map, documented conservative bounds for residual sums and upsampled
    concats)."""
    from evflow.analysis import analyze_model, ops_report
    from evflow.data.h5_stream import H5EventStream
    from evflow.data.synthetic import make_dataset
    from evflow.registry import build_model

    root = str(tmp_path / "d")
    make_dataset(root, num_sequences=1, resolution=(32, 32),
                 events_per_sec=20000, duration=0.3, flows=[(8.0, 0.0)])
    cfg = {
        "data": {"path": root, "mode": "events", "window": 500},
        "loader": {"resolution": [32, 32], "std_resolution": [32, 32],
                   "batch_size": 1, "augment": [], "seed": 0},
        "hot_filter": {"enabled": False}, "vis": {"bars": False},
    }
    model = build_model({"name": "SpikingRecEVFlowNet", "num_bins": 2,
                         "base_num_channels": 4, "kernel_size": 3,
                         "encoding": "cnt", "mask_output": True,
                         "spiking_neuron": {"leak": [-4.0, 0.1],
                                            "thresh": [0.8, 0.0]}})
    assert len(model.unit_names) == model.num_states == 16
    states = model.init_states(1, 32, 32)
    v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((1, 32, 32, 2)),
                   states)
    stream = H5EventStream(cfg, 2)
    prof = analyze_model(model, v, stream, num_batches=3, verbose=False,
                         ops=False)
    stream.close()
    assert prof.steps == 3
    rep_act = prof.report()
    assert set(rep_act) == set(model.unit_names)

    rep = ops_report(model, 32, 32, activity=rep_act, input_density=0.1,
                     verbose=False)
    hw1, k2 = 16 * 16, 9
    u = rep["units"]
    # channel plan at C=4, E=4, 32² (already 16-divisible: no padding)
    assert u["enc0.conv"]["dense_macs"] == hw1 * k2 * 2 * 8
    assert u["enc0.rec"]["dense_macs"] == 2 * hw1 * k2 * 8 * 8
    assert u["res0.c1"]["dense_macs"] == 2 * 2 * k2 * 64 * 64
    assert u["dec0"]["dense_macs"] == 4 * 4 * k2 * 128 * 32
    assert u["pred0"]["dense_macs"] == 4 * 4 * 32 * 2
    assert rep["dense_macs_per_window"] == sum(
        x["dense_macs"] for x in u.values())
    assert u["enc0.conv"]["effective_ops"] == u["enc0.conv"]["dense_macs"] * 0.1
    for x in u.values():
        assert 0.0 <= x["effective_ops"] <= x["dense_macs"]
    # bound-gated rows are marked; measured rows are not
    assert u["dec0"]["gate_is_bound"] and not u["enc1.conv"]["gate_is_bound"]
    assert rep["sparsity_speedup"] == (
        rep["dense_macs_per_window"] / rep["effective_ops_per_window"])
    # without activity, only dense counts
    rep2 = ops_report(model, 32, 32, verbose=False)
    assert rep2["effective_ops_per_window"] is None


def test_flow_to_image():
    flow = np.zeros((16, 16, 2), np.float32)
    flow[:8, :, 0] = 1.0
    flow[8:, :, 0] = -1.0
    img = viz.flow_to_image(flow)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # opposite directions get different hues
    assert not np.array_equal(img[0, 0], img[15, 0])


def test_events_to_image_colors():
    cnt = np.zeros((8, 8, 2), np.float32)
    cnt[2, 2, 0] = 5  # positive -> green
    cnt[5, 5, 1] = 5  # negative -> red
    img = viz.events_to_image(cnt)
    assert img[2, 2, 1] > 0 and img[2, 2, 0] == 0
    assert img[5, 5, 0] > 0 and img[5, 5, 1] == 0


def test_error_to_image():
    err = np.random.default_rng(0).uniform(0, 2, (8, 8)).astype(np.float32)
    img = viz.error_to_image(err)
    assert img.shape == (8, 8, 3)
    assert img[..., 1].max() == 0  # red channel only


def test_visualization_store(tmp_path):
    cfg = {"vis": {"store_type": "image", "store_interval": 0.0}}
    v = viz.Visualization(cfg, eval_id=0, path_results=str(tmp_path))
    inputs = {"event_cnt": np.random.rand(1, 16, 16, 2).astype(np.float32),
              "gtflow": np.random.randn(1, 16, 16, 2).astype(np.float32)}
    flow = np.random.randn(1, 16, 16, 2).astype(np.float32)
    iwe = np.random.rand(1, 16, 16, 2).astype(np.float32)
    v.store(inputs, flow, iwe, "seq_a", ts=0.1)
    v.store(inputs, flow, iwe, "seq_a", ts=0.2)
    base = os.path.join(str(tmp_path), "eval_0", "seq_a")
    for kind in ("events", "flow", "gtflow", "iwe", "stitched"):
        files = os.listdir(os.path.join(base, kind))
        assert len(files) == 2, kind
    v.close_videos()


def test_visualization_store_interval_throttling(tmp_path):
    cfg = {"vis": {"store_type": "image", "store_interval": 1.0}}
    v = viz.Visualization(cfg, eval_id=0, path_results=str(tmp_path))
    inputs = {"event_cnt": np.random.rand(1, 8, 8, 2).astype(np.float32)}
    flow = np.random.randn(1, 8, 8, 2).astype(np.float32)
    for ts in (0.0, 0.5, 1.2, 1.3):
        v.store(inputs, flow, None, "s", ts=ts)
    files = os.listdir(os.path.join(str(tmp_path), "eval_0", "s", "flow"))
    assert len(files) == 2  # ts 0.0 and 1.2 only


def test_vis_activity_accumulates(tmp_path):
    log = viz.vis_activity({"1:head": 0.5}, None)
    log = viz.vis_activity({"1:head": 0.7}, log, save_path=str(tmp_path / "act.png"))
    assert log["1:head"] == [0.5, 0.7]
    assert os.path.exists(str(tmp_path / "act.png"))


@pytest.mark.parametrize("script,args", [
    ("tools/compare_inits.py", []),
    ("plot_evaluation_comparison.py", []),
])
def test_cli_tools_run(script, args, tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPLBACKEND="Agg")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    out = subprocess.run(
        [sys.executable, script, "--out", str(tmp_path / "o.png")] + args,
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(str(tmp_path / "o.png"))


def test_visualization_store_masked_flow_panels(tmp_path):
    """masked_flow produces both the color-wheel grad panel and the arrow
    vector panel with GT overlay (visualization.py:222-570,711-1022)."""
    cfg = {"vis": {"store_type": "image", "vec_mode": "grid", "vec_step": 4}}
    v = viz.Visualization(cfg, eval_id=0, path_results=str(tmp_path))
    rng = np.random.default_rng(0)
    inputs = {
        "event_cnt": rng.random((1, 16, 16, 2)).astype(np.float32),
        "gtflow": rng.standard_normal((1, 16, 16, 2)).astype(np.float32),
        "event_mask": (rng.random((1, 16, 16, 1)) > 0.5).astype(np.float32),
    }
    flow = rng.standard_normal((1, 16, 16, 2)).astype(np.float32)
    masked = flow * (inputs["event_mask"] > 0)
    err = rng.random((1, 16, 16)).astype(np.float32)
    v.store(inputs, flow, None, "seq", masked_flow=masked, ts=0.1,
            error_map=err, error_is_angle=True)
    base = os.path.join(str(tmp_path), "eval_0", "seq")
    for kind in ("masked_flow_grad", "masked_flow_vec", "error"):
        assert os.listdir(os.path.join(base, kind)), kind


def test_flow_to_vector_modes():
    rng = np.random.default_rng(1)
    flow = rng.standard_normal((32, 32, 2)).astype(np.float32) * 3
    mask = rng.random((32, 32)) > 0.7
    for mode in ("grid", "sparse", "center"):
        img = viz.flow_to_vector(flow, step=4, mode=mode, mask=mask,
                                 gtflow=flow * 0.5)
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    # grid mode with nonzero flow must draw something
    assert viz.flow_to_vector(flow, step=4).any()


def test_make_synthetic_cli_and_quickstart_configs(tmp_path):
    """tools/make_synthetic.py writes reference-schema files with the
    requested GT flows, and the quickstart configs drive the registry
    (docs/GETTING_STARTED.md path)."""
    import h5py

    env = dict(os.environ, JAX_PLATFORMS="cpu", MPLBACKEND="Agg")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    out = subprocess.run(
        [sys.executable, "tools/make_synthetic.py", str(tmp_path / "ds"),
         "-n", "2", "--flows", "12", "-8", "-10", "14", "--rate_mode", "motion"],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    with h5py.File(str(tmp_path / "ds" / "seq_000.h5")) as f:
        assert {"xs", "ys", "ts", "ps"} <= set(f["events"])
        assert "flow_dt1" in f and "flow_dt4" in f
        first = sorted(f["flow_dt1"])[1]
        fm = np.asarray(f["flow_dt1"][first])
        # GT displacement per dt1 frame: flow(px/s) * 0.1 s
        np.testing.assert_allclose(fm[0].mean(), 1.2, atol=1e-5)
        np.testing.assert_allclose(fm[1].mean(), -0.8, atol=1e-5)

    from evflow import registry
    from evflow.config import load_config

    for name in ("configs/quickstart_train.yml", "configs/quickstart_eval.yml"):
        cfg = load_config(os.path.join("/root/repo", name))
        assert cfg["model"]["name"] == "LIFFireNet_short"
        assert "spiking_neuron" in cfg["model"]
        model = registry.build_model(cfg["model"])
        assert model is not None
    assert load_config("/root/repo/configs/quickstart_eval.yml")["data"]["mode"] == "gtflow_dt1"


def test_convert_mvsec_roundtrip(tmp_path):
    """tools/convert_mvsec.py: a fake raw-MVSEC pair (davis/left layout of
    the public Zhu et al. distribution) converts into a reference-schema
    sequence that streams through the FULL gtflow eval protocol; dt4
    composition of constant-flow frames is exact (K identical constant
    maps compose to K*d)."""
    h5py = pytest.importorskip("h5py")
    from tools.convert_mvsec import compose_flow, convert

    H = W = 16
    rng = np.random.default_rng(0)
    n = 6000
    vx, vy = 5.0, -2.0
    dur = 0.5
    t0 = 1000.0
    ts = np.sort(rng.uniform(0, dur, n)) + t0
    raw = str(tmp_path / "seq_data.hdf5")
    gt = str(tmp_path / "seq_gt.hdf5")
    ev = np.stack([
        rng.uniform(0, W - 1, n), rng.uniform(0, H - 1, n), ts,
        rng.choice([-1.0, 1.0], n)], axis=1)
    with h5py.File(raw, "w") as f:
        f.create_dataset("davis/left/events", data=ev)
        imgs = rng.integers(0, 255, (5, H, W)).astype(np.uint8)
        f.create_dataset("davis/left/image_raw", data=imgs)
        f.create_dataset("davis/left/image_raw_ts",
                         data=np.linspace(t0, t0 + dur, 5))
    n_gt = 6
    gt_ts = np.linspace(t0, t0 + dur, n_gt)
    dt = gt_ts[1] - gt_ts[0]
    flow = np.zeros((n_gt, 2, H, W), np.float32)
    flow[:, 0] = vx * dt
    flow[:, 1] = vy * dt
    with h5py.File(gt, "w") as f:
        f.create_dataset("davis/left/flow_dist", data=flow)
        f.create_dataset("davis/left/flow_dist_ts", data=gt_ts)

    out = str(tmp_path / "converted" / "seq_000.h5")
    info = convert(raw, out, gt_path=gt)
    assert info["events"] == n and info["gt_frames"] == n_gt
    assert info["dt4_frames"] == n_gt - 3

    # constant-field composition is exact
    comp = compose_flow(flow[:4])
    np.testing.assert_allclose(comp[0], 4 * vx * dt, rtol=1e-6)
    np.testing.assert_allclose(comp[1], 4 * vy * dt, rtol=1e-6)

    with h5py.File(out, "r") as f:
        assert f.attrs["t0"] == ts[0]
        assert set(f["events"]) == {"xs", "ys", "ts", "ps"}
        assert set(np.unique(f["events/ps"][:])) <= {0.0, 1.0}
        fr = f["flow_dt1/frame_000002"]
        assert fr.shape == (2, H, W)
        assert abs(fr.attrs["timestamp"] - gt_ts[2]) < 1e-9
        assert len(f["images"]) == 5

    # the converted file runs the full gtflow eval protocol
    from evflow.eval import evaluate
    from evflow.registry import build_model

    cfg = {
        "data": {"path": os.path.dirname(out), "mode": "gtflow_dt1",
                 "window": 1},
        "model": {"name": "LIFFireNet_short", "num_bins": 2,
                  "base_num_channels": 8, "kernel_size": 3,
                  "encoding": "cnt", "mask_output": True,
                  "spiking_neuron": {"leak": [0.0, 1.0],
                                     "thresh": [0.1, 0.8]}},
        "loader": {"resolution": [H, W], "std_resolution": [H, W],
                   "batch_size": 1, "augment": [], "seed": 0},
        "hot_filter": {"enabled": False},
        "vis": {"bars": False},
        "metrics": {"name": ["AEE"], "flow_scaling": W},
        "loss": {},
    }
    res = evaluate(cfg, debug=True, verbose=False, max_windows=3)
    vals = [float(v) for v in res.get("AEE", {}).values()]
    assert vals and all(np.isfinite(v) for v in vals)
