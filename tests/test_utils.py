"""Tracker, progress bar, model summary, quantized checkpoints (SURVEY §5.5/§5.4)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from evflow.models.summary import count_params, summarize
from evflow.utils.progress import ProgressBar
from evflow.utils.tracker import Run, create_model_dir, log_config, log_results, save_csv


def test_run_tracker(tmp_path):
    run = Run(str(tmp_path), "exp1")
    run.log_params({"lr": 0.1, "model": {"name": "LIFFireNet"}})
    run.log_metric("loss", 1.5, step=0)
    run.log_metric("loss", 1.2, step=1)
    assert os.path.exists(os.path.join(run.dir, "params.yaml"))
    lines = open(os.path.join(run.dir, "metrics.jsonl")).read().strip().split("\n")
    assert len(lines) == 2
    assert json.loads(lines[1])["value"] == 1.2
    params = Run.load_params(str(tmp_path), "exp1", run.runid)
    assert params["model"]["name"] == "LIFFireNet"


def test_log_config_autoincrement(tmp_path):
    d = create_model_dir(str(tmp_path), "runX")
    assert log_config(d, "runX", {"a": 1}) == 0
    assert log_config(d, "runX", {"a": 2}) == 1
    log_results("runX", {"AEE": {"f.h5": "1.0"}}, d, 1)
    assert os.path.exists(os.path.join(d, "metrics_1.yml"))


def test_save_csv(tmp_path):
    p = str(tmp_path / "g.csv")
    save_csv([{"a": 1, "b": 2}], p)
    save_csv([{"a": 3, "b": 4}], p)
    lines = open(p).read().strip().split("\n")
    assert len(lines) == 3  # header + 2 rows


def test_progress_bar(capsys):
    import io

    buf = io.StringIO()
    bar = ProgressBar("seq.h5", max=10, stream=buf)
    for _ in range(5):
        bar.next()
    bar.finish()
    out = buf.getvalue()
    assert "seq.h5" in out and "Hz" in out and "50%" in out


def test_count_params_and_summary():
    from evflow.registry import build_model

    cfg = {"name": "LIFFireNet_short", "num_bins": 2, "base_num_channels": 8,
           "kernel_size": 3, "encoding": "cnt",
           "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
    m = build_model(cfg)
    states = m.init_states(1, 16, 16)
    v = m.init(jax.random.PRNGKey(0), None, jnp.zeros((1, 16, 16, 2)), states)
    n = count_params(v)
    assert n == 3778  # LIFFireNet_short at 8ch (see test_models smoke values)
    s = summarize(v, "LIFFireNet_short")
    assert "TOTAL" in s and "head" in s and f"{n:,d}" in s


def test_quantized_checkpoint_roundtrip(tmp_path):
    from evflow.quant.qcheckpoint import (
        inspect_quantized_checkpoint,
        load_quantized_checkpoint,
        save_quantized_checkpoint,
    )

    params = {
        "head": {"ff": {"kernel": np.random.default_rng(0).normal(size=(3, 3, 2, 8)).astype(np.float32)},
                 "beta": np.full(8, 0.5, np.float32),
                 "threshold": np.full(8, 0.3, np.float32)},
    }
    state = {"params": params, "batch_stats": {}, "opt_state": None,
             "epoch": 1, "loss": 0.2, "loss_variance": 0.01}
    d = str(tmp_path / "q")
    save_quantized_checkpoint(d, state, {"model": {"name": "x"}},
                              state_quant_ranges={"0": (-40.0, 1.0)})
    assert os.path.exists(os.path.join(d, "quant_metadata.yaml"))

    template = {"params": jax.tree.map(np.zeros_like, params), "batch_stats": {},
                "opt_state": None, "epoch": 0, "loss": 0.0, "loss_variance": 0.0}
    restored, meta = load_quantized_checkpoint(d, template)
    assert meta["num_bits"] == 8
    assert "head/ff/kernel" in meta["weight_scales"]
    assert meta["state_quant_ranges"]["0"] == [-40.0, 1.0]
    assert meta["lif_params"]["head"]["beta"][0] == 0.5
    # quantized weights are on the int8 grid
    s = meta["weight_scales"]["head/ff/kernel"]
    q = restored["params"]["head"]["ff"]["kernel"] / s
    np.testing.assert_allclose(q, np.round(q), atol=1e-3)

    report = inspect_quantized_checkpoint(d, verbose=False)
    assert report["num_bits"] == 8


def test_vis_activity_live_plot(monkeypatch):
    """vis_activity(live=True) under a DISPLAY drives the persistent
    interactive figure (reference visualization.py:1087-1126 live plot);
    headless (no DISPLAY) it only accumulates."""
    import matplotlib

    matplotlib.use("Agg")
    from evflow.utils import viz

    monkeypatch.delenv("DISPLAY", raising=False)
    log = viz.vis_activity({"head": 0.1}, None, live=True)
    assert log == {"head": [0.1]}
    assert getattr(viz._draw_activity_live, "_fig", None) is None

    monkeypatch.setenv("DISPLAY", ":0")
    log = viz.vis_activity({"head": 0.2}, log, live=True)
    log = viz.vis_activity({"head": 0.3}, log, live=True)
    assert log["head"] == [0.1, 0.2, 0.3]
    fig = getattr(viz._draw_activity_live, "_fig", None)
    assert fig is not None
    ax = viz._draw_activity_live._ax
    assert len(ax.lines) == 1 and list(ax.lines[0].get_ydata()) == log["head"]
    import matplotlib.pyplot as plt

    plt.close(fig)
    viz._draw_activity_live._fig = None
