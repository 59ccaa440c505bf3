"""AEE parity of the headline bench configuration vs f32.

The headline benchmark (bench.py) runs LIFFireNet with ``compute_dtype=
bfloat16, state_dtype=bfloat16, conv_impl=dypack``. The north star is
throughput *with AEE within 1% of reference* (BASELINE.md) — bf16 membrane
carries could in principle drift over long sequences (spike flips compound
through the recurrence), so this test proves the accuracy half: a trained
model evaluated under the full gtflow protocol (reference eval_flow.py
:208-343 semantics) over a multi-hundred-window synthetic sequence must
produce AEE within 1% of the f32/lax-conv path from the same checkpoint.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evflow.config import combine_entries
from evflow.eval import evaluate
from evflow.registry import build_model
from evflow.train import train
from evflow.utils.checkpoint import load_checkpoint

h5py = pytest.importorskip("h5py")

RES = 64


def _model_cfg(**over):
    cfg = {
        "name": "LIFFireNet_short",
        "encoding": "cnt",
        "round_encoding": False,
        "norm_input": False,
        "num_bins": 2,
        "base_num_channels": 8,
        "kernel_size": 3,
        "mask_output": True,
        "spiking_neuron": {
            "leak": [0.0, 1.0],
            "thresh": [0.0, 0.8],
            "learn_leak": True,
            "learn_thresh": True,
            "hard_reset": True,
        },
    }
    cfg.update(over)
    return cfg


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from evflow.data.synthetic import make_dataset

    base = tmp_path_factory.mktemp("bf16_parity")
    train_root = str(base / "train")
    root = str(base / "eval")
    # short sequences for training (epochs complete -> checkpoints written)
    make_dataset(
        train_root,
        num_sequences=2,
        resolution=(RES, RES),
        events_per_sec=120_000,
        duration=1.0,
        flows=[(12.0, -8.0), (-10.0, 6.0)],
        gt_hz=10.0,
    )
    # one long sequence for eval: 4 s @ 60 GT Hz -> ~240 gtflow windows
    make_dataset(
        root,
        num_sequences=1,
        resolution=(RES, RES),
        events_per_sec=120_000,
        duration=4.0,
        flows=[(12.0, -8.0)],
        gt_hz=60.0,
    )
    tcfg = combine_entries(
        {
            "experiment": "bf16_parity",
            "data": {"path": train_root, "mode": "events", "window": 500, "window_loss": 2500},
            "model": _model_cfg(),
            "loss": {"flow_regul_weight": 0.001, "clip_grad": 1.0},
            "optimizer": {"name": "Adam", "lr": 0.002},
            "loader": {
                "n_epochs": 10000,
                "batch_size": 2,
                "resolution": [RES, RES],
                "std_resolution": [RES, RES],
                "augment": [],
                "seed": 0,
            },
            "vis": {"verbose": False, "store_grads": False, "bars": False},
            "hot_filter": {"enabled": False},
        }
    )
    run = train(tcfg, path_runs=os.path.join(train_root, "runs"), max_steps=100, verbose=False)
    ck = glob.glob(os.path.join(run.dir, "checkpoints", "most_recent", "*"))[0]

    model = build_model(_model_cfg())
    st = model.init_states(1, RES, RES)
    v0 = model.init(jax.random.PRNGKey(0), None, jnp.zeros((1, RES, RES, 2)), st)
    tmpl = {
        "params": v0["params"],
        "batch_stats": v0.get("batch_stats", {}),
        "opt_state": None,
        "epoch": 0,
        "loss": 0.0,
        "loss_variance": 0.0,
    }
    restored = load_checkpoint(ck, tmpl)
    variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}
    return root, variables


def _eval_aee(root, variables, tag, **model_over):
    ecfg = combine_entries(
        {
            "experiment": "bf16_parity",
            "data": {"path": root, "mode": "gtflow_dt1", "window": 1},
            "model": _model_cfg(**model_over),
            "metrics": {"name": ["AEE"], "flow_scaling": RES, "heat_map": False},
            "loader": {
                "batch_size": 1,
                "resolution": [RES, RES],
                "std_resolution": [RES, RES],
                "augment": [],
                "seed": 0,
            },
            "vis": {"verbose": False, "enabled": False, "bars": False},
            "hot_filter": {"enabled": False},
        }
    )
    model = build_model(ecfg["model"])
    res = evaluate(
        ecfg,
        path_results=os.path.join(root, "res", tag),
        debug=True,
        model=model,
        variables=variables,
        max_windows=240,
        verbose=False,
    )
    return float(np.mean([float(x) for x in res["AEE"].values()]))


def test_bench_config_aee_within_1pct(trained):
    """The exact bench.py dtype config (bf16 compute + bf16 membrane carries +
    im2col convs) must hold AEE within 1% of the f32 path over ~240 windows."""
    root, variables = trained
    aee_f32 = _eval_aee(root, variables, "f32", conv_impl="lax")
    aee_bf16 = _eval_aee(
        root,
        variables,
        "bf16",
        compute_dtype="bfloat16",
        state_dtype="bfloat16",
        conv_impl="dypack",
    )
    assert aee_f32 > 0.05, "trained model should produce non-trivial flow"
    rel = abs(aee_bf16 - aee_f32) / aee_f32
    assert rel < 0.01, (
        f"bench-config AEE diverged from f32: {aee_bf16:.4f} vs {aee_f32:.4f} "
        f"({100 * rel:.2f}%)"
    )


def test_im2col_matches_lax_conv_exactly_f32(trained):
    """With f32 everywhere, im2col and lax conv are the same math — AEE must
    agree to float tolerance (guards the fast path's correctness separately
    from dtype effects)."""
    root, variables = trained
    aee_lax = _eval_aee(root, variables, "f32_lax", conv_impl="lax")
    aee_im2col = _eval_aee(root, variables, "f32_im2col", conv_impl="im2col")
    assert abs(aee_lax - aee_im2col) / max(aee_lax, 1e-9) < 1e-3
