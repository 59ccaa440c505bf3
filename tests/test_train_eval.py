"""End-to-end: training step, TBPTT window loop, evaluation protocol."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evflow.data.synthetic import make_dataset
from evflow.eval import evaluate
from evflow.train import clamp_thresholds, stack_window, train


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    make_dataset(root, num_sequences=2, resolution=(32, 32), events_per_sec=30_000,
                 duration=0.5, flows=[(10.0, -5.0), (-8.0, 4.0)], gt_hz=10.0)
    return root


def train_cfg(root, batch=2):
    return {
        "experiment": "test",
        "data": {"path": root, "mode": "events", "window": 250, "window_loss": 750},
        "model": {
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
        },
        "loss": {"flow_regul_weight": 0.001, "clip_grad": 1.0, "overwrite_intermediate": False},
        "optimizer": {"name": "Adam", "lr": 0.0002},
        "loader": {
            "n_epochs": 100,
            "batch_size": batch,
            "resolution": [32, 32],
            "std_resolution": [32, 32],
            "augment": [],
            "augment_prob": [],
            "seed": 0,
        },
        "vis": {"verbose": False, "enabled": False, "store_grads": False, "bars": False},
        "hot_filter": {"enabled": False},
    }


def eval_cfg(root):
    cfg = train_cfg(root, batch=1)
    cfg["data"] = {"path": root, "mode": "gtflow_dt1", "window": 1, "window_eval": 15000}
    cfg["metrics"] = {"name": ["AEE", "AAE", "AE_ofMeans"], "flow_scaling": 32, "heat_map": False}
    return cfg


def test_stack_window_pads_to_common_n():
    def mk(n):
        return {
            "event_list": np.ones((1, n, 4), np.float32),
            "event_list_pol_mask": np.ones((1, n, 2), np.float32),
            "event_valid": np.ones((1, n), np.float32),
            "event_cnt": np.zeros((1, 4, 4, 2), np.float32),
            "event_voxel": np.zeros((1, 4, 4, 2), np.float32),
            "event_mask": np.zeros((1, 4, 4, 1), np.float32),
        }

    w = stack_window([mk(10), mk(20)])
    assert w["event_list"].shape == (2, 1, 20, 4)
    assert w["event_valid"][0].sum() == 10 and w["event_valid"][1].sum() == 20


def test_compact_window_wire_dtypes():
    """compact_window drops the dead encoding and shrinks wire dtypes; the
    jitted step restores f32, so step outputs are bit-identical for integer
    counts/masks."""
    from evflow.train import compact_window

    w = {
        "event_list": np.random.rand(2, 1, 8, 4).astype(np.float32),
        "event_list_pol_mask": (np.random.rand(2, 1, 8, 2) > 0.5).astype(np.float32),
        "event_valid": np.ones((2, 1, 8), np.float32),
        "event_cnt": np.round(np.random.rand(2, 1, 4, 4, 2) * 5).astype(np.float32),
        "event_voxel": np.random.rand(2, 1, 4, 4, 2).astype(np.float32),
        "event_mask": np.ones((2, 1, 4, 4, 1), np.float32),
    }
    c = compact_window(w, "cnt")
    assert c["event_voxel"] is None
    assert c["event_cnt"].dtype == np.uint8  # small non-negative counts
    assert c["event_mask"].dtype == np.uint8
    np.testing.assert_array_equal(c["event_cnt"].astype(np.float32), w["event_cnt"])
    np.testing.assert_array_equal(
        c["event_list_pol_mask"].astype(np.float32), w["event_list_pol_mask"])
    # counts past the uint8 range (hot pixels / signed temporal_cnt) fall
    # back to int16 — still exact
    w_big = dict(w, event_cnt=w["event_cnt"] + 300.0)
    cb = compact_window(w_big, "cnt")
    assert cb["event_cnt"].dtype == np.int16
    np.testing.assert_array_equal(
        cb["event_cnt"].astype(np.float32), w_big["event_cnt"])
    w_sgn = dict(w, event_cnt=w["event_cnt"] - 3.0)
    assert compact_window(w_sgn, "cnt")["event_cnt"].dtype == np.int16
    # derive_mask drops the mask from the wire entirely
    cd = compact_window(w, "cnt", derive_mask=True)
    assert cd["event_mask"] is None
    c2 = compact_window(w, "voxel")
    assert c2["event_cnt"] is None and c2["event_voxel"] is not None


def test_compact_window_step_equivalence(dataset):
    """One jitted train step over a compacted wire window produces the same
    loss and params as the plain f32 window (integer counts/masks are exact
    in float16/uint8)."""
    import optax
    from evflow.config import combine_entries
    from evflow.loss.warp_loss import EventWarpingConfig
    from evflow.registry import build_model
    from evflow.train import compact_window, make_train_step

    cfg = combine_entries(train_cfg(dataset, batch=1))
    model = build_model(cfg["model"])
    B, H, W, P, N = 1, 32, 32, 2, 64
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states)
    tx = optax.adam(1e-3)
    opt = tx.init(v["params"])
    step = make_train_step(model, tx, EventWarpingConfig(cfg), 4)

    rng = np.random.default_rng(0)
    ts = np.sort(rng.random((P, B, N, 1)), axis=2).astype(np.float32)
    ys = (rng.random((P, B, N, 1)) * (H - 1)).astype(np.float32)
    xs = (rng.random((P, B, N, 1)) * (W - 1)).astype(np.float32)
    ps = (rng.random((P, B, N, 1)) > 0.5).astype(np.float32)
    window = {
        "event_list": np.concatenate([ts, ys, xs, ps], -1),
        "event_list_pol_mask": np.concatenate([ps, 1 - ps], -1),
        "event_valid": np.ones((P, B, N), np.float32),
        "event_cnt": rng.poisson(0.3, (P, B, H, W, 2)).astype(np.float32),
        "event_voxel": rng.random((P, B, H, W, 2)).astype(np.float32),
        "event_mask": np.ones((P, B, H, W, 1), np.float32),
    }
    def fresh(t):
        return jax.tree.map(jnp.array, t)  # step donates its first 4 args

    out_full = step(fresh(v["params"]), fresh(v.get("batch_stats", {})),
                    fresh(opt), fresh(states), window)
    out_comp = step(fresh(v["params"]), fresh(v.get("batch_stats", {})),
                    fresh(opt), fresh(states), compact_window(window, "cnt"))
    np.testing.assert_allclose(float(out_full[0]), float(out_comp[0]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out_full[1]), jax.tree.leaves(out_comp[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_remat_step_matches_baseline(dataset):
    """``remat="full"`` (the shipped default: jax.checkpoint around the scan
    body, BENCH_NOTES round 8) recomputes the same deterministic ops in the
    backward — loss and updated params match the no-remat step."""
    import optax
    from evflow.config import combine_entries
    from evflow.loss.warp_loss import EventWarpingConfig
    from evflow.registry import build_model
    from evflow.train import make_train_step

    cfg = combine_entries(train_cfg(dataset, batch=1))
    model = build_model(cfg["model"])
    B, H, W, P, N = 1, 32, 32, 2, 64
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states)
    tx = optax.adam(1e-3)
    opt = tx.init(v["params"])

    rng = np.random.default_rng(1)
    ts = np.sort(rng.random((P, B, N, 1)), axis=2).astype(np.float32)
    ys = (rng.random((P, B, N, 1)) * (H - 1)).astype(np.float32)
    xs = (rng.random((P, B, N, 1)) * (W - 1)).astype(np.float32)
    ps = (rng.random((P, B, N, 1)) > 0.5).astype(np.float32)
    window = {
        "event_list": np.concatenate([ts, ys, xs, ps], -1),
        "event_list_pol_mask": np.concatenate([ps, 1 - ps], -1),
        "event_valid": np.ones((P, B, N), np.float32),
        "event_cnt": rng.poisson(0.3, (P, B, H, W, 2)).astype(np.float32),
        "event_voxel": rng.random((P, B, H, W, 2)).astype(np.float32),
        "event_mask": np.ones((P, B, H, W, 1), np.float32),
    }

    def fresh(t):
        return jax.tree.map(jnp.array, t)  # step donates its first 4 args

    outs = {}
    for remat in ("none", "full", "dots"):
        step = make_train_step(model, tx, EventWarpingConfig(cfg), 4, remat=remat)
        outs[remat] = step(fresh(v["params"]), fresh(v.get("batch_stats", {})),
                           fresh(opt), fresh(states), window)
    for remat in ("full", "dots"):
        np.testing.assert_allclose(
            float(outs["none"][0]), float(outs[remat][0]), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(outs["none"][1]),
                        jax.tree.leaves(outs[remat][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    with pytest.raises(ValueError, match="remat"):
        make_train_step(model, tx, EventWarpingConfig(cfg), 4, remat="bogus")


def test_clamp_thresholds():
    params = {"head": {"threshold": jnp.array([-0.5, 0.2]), "beta": jnp.array([-0.5])}}
    out = clamp_thresholds(params)
    np.testing.assert_allclose(np.asarray(out["head"]["threshold"]), [0.01, 0.2])
    np.testing.assert_allclose(np.asarray(out["head"]["beta"]), [-0.5])  # untouched


def test_train_runs_and_updates(dataset, tmp_path):
    cfg = train_cfg(dataset)
    run = train(cfg, path_runs=str(tmp_path / "runs"), max_steps=4, verbose=False)
    # metrics logged
    assert os.path.exists(os.path.join(run.dir, "params.yaml"))


def test_train_loss_finite_and_decreasing_tendency(dataset, tmp_path):
    cfg = train_cfg(dataset)
    cfg["optimizer"]["lr"] = 0.002
    run = train(cfg, path_runs=str(tmp_path / "runs"), max_steps=12, verbose=False)
    # parse metrics written at epoch boundaries if any; at minimum no crash
    assert os.path.isdir(run.dir)


def test_evaluate_random_model(dataset, tmp_path):
    cfg = eval_cfg(dataset)
    results = evaluate(cfg, path_results=str(tmp_path / "res"), debug=True,
                       max_windows=6, verbose=False)
    assert "AEE" in results and len(results["AEE"]) >= 1
    for v in results["AEE"].values():
        assert np.isfinite(float(v))
    assert "AEE_percent" in results
    assert "AE_ofMeans" in results


def test_evaluate_writes_metrics_yaml(dataset, tmp_path):
    cfg = eval_cfg(dataset)
    res_dir = str(tmp_path / "res")
    evaluate(cfg, path_results=res_dir, runid="testrun", debug=False,
             max_windows=4, verbose=False)
    out = os.path.join(res_dir, "testrun")
    assert os.path.exists(os.path.join(out, "eval_0.yml"))
    assert os.path.exists(os.path.join(out, "metrics_0.yml"))


def test_evaluate_keep_gt_full_res(dataset, tmp_path):
    cfg = eval_cfg(dataset)
    cfg["loader"]["resolution"] = [16, 16]
    cfg["loader"]["std_resolution"] = [32, 32]
    cfg["loader"]["keep_gt_full_res"] = True
    results = evaluate(cfg, path_results=str(tmp_path / "r2"), debug=True,
                       max_windows=4, verbose=False)
    for v in results["AEE"].values():
        assert np.isfinite(float(v))


def test_checkpoint_roundtrip(dataset, tmp_path):
    from evflow.registry import build_model
    from evflow.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = train_cfg(dataset)
    model = build_model(cfg["model"])
    states = model.init_states(1, 32, 32)
    cnt = jnp.zeros((1, 32, 32, 2))
    v = model.init(jax.random.PRNGKey(0), None, cnt, states)
    state = {"params": v["params"], "batch_stats": v.get("batch_stats", {}),
             "opt_state": None, "epoch": 3, "loss": 0.5, "loss_variance": 0.1}
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state, cfg)
    restored = load_checkpoint(d, jax.tree.map(np.zeros_like, state))
    assert restored["epoch"] == 3
    chex_equal = jax.tree.map(lambda a, b: np.allclose(a, b), state["params"], restored["params"])
    assert all(jax.tree.leaves(chex_equal))


def test_checkpoint_policy(tmp_path):
    from evflow.utils.checkpoint import CheckpointPolicy

    pol = CheckpointPolicy(str(tmp_path / "ck"))
    st = {"params": {"w": np.zeros(3)}, "batch_stats": {}, "opt_state": None}
    w1 = pol.update(0, 1.0, 5.0, 20, st)
    assert w1["lowest_loss"] and w1["smoothest_loss"]
    w2 = pol.update(1, 2.0, 1.0, 20, st)   # loss worse, variance better
    assert not w2["lowest_loss"] and w2["smoothest_loss"]
    w3 = pol.update(2, 0.5, 9.0, 20, st)
    assert w3["lowest_loss"] and not w3["smoothest_loss"]
    assert os.path.exists(pol.paths["most_recent"])
    assert "2" in pol.paths["lowest_loss"]


def test_train_resume_from_checkpoint(dataset, tmp_path):
    """--prev_runid resume path (train_flow.py:318-322 / utils.load_model)."""
    import glob

    cfg = train_cfg(dataset, batch=1)
    # 2 sequences x 60 windows / (P=3 per step) ~= 40 steps to cross an epoch
    run1 = train(cfg, path_runs=str(tmp_path / "r1"), max_steps=55, verbose=False)
    cks = glob.glob(os.path.join(run1.dir, "checkpoints", "most_recent", "*"))
    assert cks, "no checkpoint written"
    run2 = train(cfg, path_runs=str(tmp_path / "r2"), prev_ckpt=cks[0],
                 max_steps=2, verbose=False)
    assert os.path.isdir(run2.dir)


def test_evaluate_dt4_fractional_window(dataset, tmp_path):
    """gtflow_dt4 with window=0.25: AEE computed at cadence round(1/w)=4
    (eval_flow.py:273-278)."""
    cfg = eval_cfg(dataset)
    cfg["data"] = {"path": dataset, "mode": "gtflow_dt4", "window": 0.25}
    cfg["metrics"] = {"name": ["AEE"], "flow_scaling": 32}
    results = evaluate(cfg, path_results=str(tmp_path / "r"), debug=True,
                       max_windows=10, verbose=False)
    assert "AEE" in results and results["AEE"]
    for v in results["AEE"].values():
        assert np.isfinite(float(v))


def test_evaluate_multires_model(dataset, tmp_path):
    """SpikingRecEVFlowNet (4 multires flows) under the eval protocol."""
    cfg = eval_cfg(dataset)
    cfg["model"] = {
        "name": "SpikingRecEVFlowNet", "encoding": "cnt", "num_bins": 2,
        "base_num_channels": 4, "kernel_size": 3, "mask_output": True,
        "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.0]},
    }
    results = evaluate(cfg, path_results=str(tmp_path / "r"), debug=True,
                       max_windows=3, verbose=False)
    for v in results["AEE"].values():
        assert np.isfinite(float(v))


def test_evaluate_overwrite_intermediate(dataset, tmp_path):
    cfg = eval_cfg(dataset)
    cfg["loss"]["overwrite_intermediate"] = True
    results = evaluate(cfg, path_results=str(tmp_path / "r"), debug=True,
                       max_windows=3, verbose=False)
    for v in results["AEE"].values():
        assert np.isfinite(float(v))


def test_train_multires_model(dataset, tmp_path):
    """SpikingRecEVFlowNet training: 4 multires flows feed the loss
    (EventWarping averages over all scales, loss/flow.py:195-301)."""
    cfg = train_cfg(dataset, batch=1)
    cfg["model"] = {
        "name": "SpikingRecEVFlowNet", "encoding": "cnt", "round_encoding": False,
        "num_bins": 2, "base_num_channels": 4, "kernel_size": 3,
        "mask_output": True,
        "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.0]},
    }
    run = train(cfg, path_runs=str(tmp_path / "runs"), max_steps=2, verbose=False)
    assert os.path.isdir(run.dir)


def test_train_with_tebn(dataset, tmp_path):
    cfg = train_cfg(dataset, batch=1)
    cfg["model"]["tebn"] = {"enabled": True, "num_timesteps": 3}
    run = train(cfg, path_runs=str(tmp_path / "runs"), max_steps=2, verbose=False)
    assert os.path.isdir(run.dir)


def test_train_qat_model(dataset, tmp_path):
    """QAT: quantization.enabled builds fake-quant hooks into the train graph."""
    cfg = train_cfg(dataset, batch=1)
    cfg["model"]["quantization"] = {"enabled": True, "PTQ": False, "Conv_only": False}
    run = train(cfg, path_runs=str(tmp_path / "runs"), max_steps=2, verbose=False)
    assert os.path.isdir(run.dir)


def test_eval_b2_matches_two_b1_runs(dataset, tmp_path):
    """Per-file AEE at batch_size=2 equals the B=1 protocol per file: each
    slot streams its own file with independent criterion state, dt_gt gating
    and cadence (reference eval_flow.py:211-214,273-278 generalized per slot)."""
    from evflow.registry import build_model

    cfg1 = eval_cfg(dataset)
    cfg1["metrics"]["name"] = ["AEE"]
    cfg2 = eval_cfg(dataset)
    cfg2["metrics"]["name"] = ["AEE"]
    cfg2["loader"]["batch_size"] = 2

    H = W = 32
    model = build_model(cfg1["model"])

    def variables_for(B):
        st = model.init_states(B, H, W)
        return model.init(
            jax.random.PRNGKey(7), None, jnp.zeros((B, H, W, 2)), st
        )

    r1 = evaluate(cfg1, path_results=str(tmp_path / "b1"), debug=True,
                  model=model, variables=variables_for(1), verbose=False)
    r2 = evaluate(cfg2, path_results=str(tmp_path / "b2"), debug=True,
                  model=model, variables=variables_for(2), verbose=False)

    assert set(r1["AEE"]) == set(r2["AEE"]) and len(r1["AEE"]) == 2
    for fname in r1["AEE"]:
        a1, a2 = float(r1["AEE"][fname]), float(r2["AEE"][fname])
        assert a1 == pytest.approx(a2, rel=1e-4), (fname, a1, a2)
    for fname in r1.get("AEE_percent", {}):
        p1 = float(r1["AEE_percent"][fname])
        p2 = float(r2["AEE_percent"][fname])
        assert p1 == pytest.approx(p2, rel=1e-4, abs=1e-7), (fname, p1, p2)


def test_evaluate_with_vis_store_writes_artifacts(dataset, tmp_path):
    """End-to-end eval with vis.store: per-sequence image dirs (events, flow,
    masked flow vectors/gradient overlays) land in the results tree —
    reference utils/visualization.py store pipeline (:222-570, :711-1022)."""
    from evflow.registry import build_model

    cfg = eval_cfg(dataset)
    cfg["vis"] = {"verbose": False, "enabled": False, "bars": False,
                  "store": True, "store_interval": 0.0, "px": 64}
    model = build_model(cfg["model"])
    states = model.init_states(1, 32, 32)
    v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((1, 32, 32, 2)), states)
    out_root = str(tmp_path / "res")
    evaluate(cfg, path_results=out_root, runid="vis", debug=False,
             model=model, variables=v, max_windows=6, verbose=False)
    hits = []
    for root, dirs, files in os.walk(out_root):
        hits += [os.path.join(root, f) for f in files if f.endswith(".png")]
    assert hits, "no stored visualization frames"
    kinds = {os.path.basename(os.path.dirname(h)) for h in hits}
    assert any("flow" in k for k in kinds), f"no flow panels in {kinds}"


def test_evaluate_live_vis_updates_windows(dataset, tmp_path, monkeypatch):
    """vis.enabled: evaluate() drives the live cv2 window suite each window
    (reference eval_flow.py:318-338 + visualization.py:43-220)."""
    import evflow.utils.viz as V

    if V.cv2 is None:
        pytest.skip("cv2 not available")
    shown = []
    monkeypatch.setenv("DISPLAY", ":0")
    monkeypatch.setattr(V.cv2, "imshow", lambda name, img: shown.append(name))
    monkeypatch.setattr(V.cv2, "waitKey", lambda t: 0)
    cfg = eval_cfg(dataset)
    cfg["vis"] = {"enabled": True, "store": False, "px": 32, "bars": False}
    evaluate(cfg, path_results=str(tmp_path / "r"), debug=True,
             max_windows=3, verbose=False)
    assert shown, "live vis enabled but no cv2 windows updated"
    names = set(shown)
    assert "flow" in names and "events" in names and "gtflow" in names


def test_evaluate_live_vis_disabled_no_windows(dataset, tmp_path, monkeypatch):
    """Without vis.enabled no live windows open even under a DISPLAY."""
    import evflow.utils.viz as V

    if V.cv2 is None:
        pytest.skip("cv2 not available")
    shown = []
    monkeypatch.setenv("DISPLAY", ":0")
    monkeypatch.setattr(V.cv2, "imshow", lambda name, img: shown.append(name))
    monkeypatch.setattr(V.cv2, "waitKey", lambda t: 0)
    cfg = eval_cfg(dataset)
    cfg["vis"] = {"enabled": False, "store": False, "bars": False}
    evaluate(cfg, path_results=str(tmp_path / "r"), debug=True,
             max_windows=2, verbose=False)
    assert not shown


def test_best_val_checkpoint_keeps_opt_state(dataset, tmp_path):
    """The epoch callback receives the live optimizer state and a
    best-validation checkpoint saved with it restores the Adam moments on
    resume (reference train_flow_validation.py:296-311 saves
    optimizer_state_dict in every checkpoint variant)."""
    from evflow.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = train_cfg(dataset, batch=1)
    best_dir = str(tmp_path / "best")
    seen = {}

    def cb(epoch, params, batch_stats, run, opt_state):
        state = {
            "params": jax.device_get(params),
            "batch_stats": jax.device_get(batch_stats),
            "opt_state": jax.device_get(opt_state),
            "epoch": epoch, "loss": 0.0, "loss_variance": 0.0,
        }
        seen["state"] = state
        save_checkpoint(best_dir, state, cfg)

    train(cfg, path_runs=str(tmp_path / "runs"), max_steps=55, verbose=False,
          epoch_callback=cb)
    assert "state" in seen, "epoch callback never fired"
    # Adam moments are non-trivial after an epoch of updates
    opt_leaves = [np.asarray(x) for x in jax.tree.leaves(seen["state"]["opt_state"])
                  if hasattr(x, "shape")]
    assert any(np.abs(l).sum() > 0 for l in opt_leaves if l.size > 1)
    # the moments survive the checkpoint roundtrip bit-exactly
    restored = load_checkpoint(
        best_dir, jax.tree.map(np.zeros_like, seen["state"])
    )
    for a, b in zip(jax.tree.leaves(seen["state"]["opt_state"]),
                    jax.tree.leaves(restored["opt_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the training resume path consumes the checkpoint
    run2 = train(cfg, path_runs=str(tmp_path / "r2"), prev_ckpt=best_dir,
                 max_steps=2, verbose=False)
    assert os.path.isdir(run2.dir)


@pytest.mark.parametrize("chunk", [3, 8])
def test_evaluate_chunked_matches_unchunked(dataset, tmp_path, chunk):
    """chunk=K scans K windows per device dispatch; the metric protocol is
    host-side per window either way, so per-file AEE/AAE must match the
    per-window path exactly (chunks flush at sequence rollovers, partial
    chunks fall back to the per-window program)."""
    from evflow.registry import build_model

    cfg = eval_cfg(dataset)
    cfg["metrics"]["name"] = ["AEE", "AAE"]
    model = build_model(cfg["model"])
    states = model.init_states(1, 32, 32)
    v = model.init(jax.random.PRNGKey(7), None, jnp.zeros((1, 32, 32, 2)), states)

    r1 = evaluate(cfg, path_results=str(tmp_path / "c1"), debug=True,
                  model=model, variables=v, verbose=False)
    rk = evaluate(cfg, path_results=str(tmp_path / f"c{chunk}"), debug=True,
                  model=model, variables=v, verbose=False, chunk=chunk)
    assert set(r1["AEE"]) == set(rk["AEE"])
    for mname in ("AEE", "AAE"):
        for fname in r1[mname]:
            assert float(r1[mname][fname]) == pytest.approx(
                float(rk[mname][fname]), rel=1e-5), (mname, fname)


def test_derive_mask_matches_loader(dataset):
    """cnt.sum(-1) > 0 IS the loader's event_mask for plain cnt windows
    (incl. hot filtering and flips) — the derive_mask wire contract; and
    the jitted step over a derive_mask window matches the full window
    bit-for-bit on a REAL streamed window."""
    import optax
    from evflow.config import combine_entries
    from evflow.data.h5_stream import H5EventStream
    from evflow.loss.warp_loss import EventWarpingConfig
    from evflow.registry import build_model
    from evflow.train import compact_window, make_train_step, stack_window

    cfg = combine_entries(train_cfg(dataset, batch=2))
    cfg["hot_filter"] = {"enabled": True}
    cfg["loader"]["augment"] = ["Horizontal", "Polarity"]
    cfg["loader"]["augment_prob"] = [0.5, 0.5]
    stream = H5EventStream(cfg, 2)
    batches = [stream.next_batch() for _ in range(6)]
    stream.close()
    for b in batches:
        derived = (b["event_cnt"].sum(-1, keepdims=True) > 0).astype(np.float32)
        np.testing.assert_array_equal(derived, b["event_mask"])

    model = build_model(cfg["model"])
    B, H, W = 2, 32, 32
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states)
    tx = optax.adam(1e-3)
    opt = tx.init(v["params"])
    step = make_train_step(model, tx, EventWarpingConfig(cfg), 4)
    window = stack_window(batches[:3])

    def fresh(t):
        return jax.tree.map(jnp.array, t)

    out_full = step(fresh(v["params"]), fresh(v.get("batch_stats", {})),
                    fresh(opt), fresh(states), window)
    out_dm = step(fresh(v["params"]), fresh(v.get("batch_stats", {})),
                  fresh(opt), fresh(states),
                  compact_window(window, "cnt", derive_mask=True))
    np.testing.assert_allclose(float(out_full[0]), float(out_dm[0]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out_full[1]), jax.tree.leaves(out_dm[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_derive_cnt_matches_loader(dataset):
    """The count grids ARE the event list's per-polarity histogram times the
    hot mask for plain cnt windows — the derive_cnt wire rebuilds them on
    device BIT-FOR-BIT from REAL streamed windows (incl. hot filtering and
    flips), and the jitted step over the count-free wire matches the full
    window exactly."""
    import optax
    from evflow.config import combine_entries
    from evflow.data.h5_stream import H5EventStream
    from evflow.loss.warp_loss import EventWarpingConfig
    from evflow.registry import build_model
    from evflow.train import (compact_window, make_train_step, restore_window,
                              stack_window)

    cfg = combine_entries(train_cfg(dataset, batch=2))
    cfg["hot_filter"] = {"enabled": True, "max_px": 4, "min_obvs": 1,
                         "max_rate": 0.05}
    cfg["loader"]["augment"] = ["Horizontal", "Vertical", "Polarity"]
    cfg["loader"]["augment_prob"] = [0.5, 0.5, 0.5]
    stream = H5EventStream(cfg, 2)
    batches = [stream.next_batch() for _ in range(6)]
    stream.close()
    assert all("hot_mask" in b for b in batches)
    # the hot filter must actually fire for this test to mean anything
    assert any((b["hot_mask"] == 0).any() for b in batches)

    window = stack_window(batches[:3])
    cw = compact_window(window, "cnt", derive_mask=True, derive_cnt=True)
    assert cw["event_cnt"] is None and cw["event_mask"] is None
    assert cw["hot_bits"].dtype == np.uint8
    assert "hot_mask" not in cw

    rw = restore_window(jax.tree.map(jnp.asarray, cw), resolution=(32, 32))
    np.testing.assert_array_equal(np.asarray(rw["event_cnt"]),
                                  window["event_cnt"])
    np.testing.assert_array_equal(
        np.asarray(rw["event_mask"]), window["event_mask"])

    # hot_mask never rides the wire unless derive_cnt asks for it
    assert "hot_mask" not in compact_window(window, "cnt", derive_mask=True)

    model = build_model(cfg["model"])
    B, H, W = 2, 32, 32
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states)
    tx = optax.adam(1e-3)
    opt = tx.init(v["params"])
    step = make_train_step(model, tx, EventWarpingConfig(cfg), 4,
                           resolution=(H, W))

    def fresh(t):
        return jax.tree.map(jnp.array, t)

    full = dict(window)
    full.pop("hot_mask")  # host-only artifact; the f32 caller ships grids
    out_full = step(fresh(v["params"]), fresh(v.get("batch_stats", {})),
                    fresh(opt), fresh(states), full)
    out_dc = step(fresh(v["params"]), fresh(v.get("batch_stats", {})),
                  fresh(opt), fresh(states), cw)
    np.testing.assert_allclose(float(out_full[0]), float(out_dc[0]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out_full[1]), jax.tree.leaves(out_dc[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # the synthetic stream has FRACTIONAL coordinates — the train loop's
    # sticky gate must reject the u16 coord wire for it (the host encoders
    # truncate, so derive_cnt above still matched bit-for-bit)
    yx = window["event_list"][..., 1:3]
    assert not (yx == np.floor(yx)).all()

    # packed wire with the sticky f32-coord fallback: 1-bit polarity +
    # per-(pass, slot) lengths + derived grids — bit-exact restore and a
    # bit-identical train step
    pf = compact_window(window, "cnt", derive_mask=True, derive_cnt=True,
                        coords_dtype=np.float32, pol_bits=True)
    assert pf["event_list"] is None and pf["event_valid"] is None
    assert pf["event_list_pol_mask"] is None
    assert pf["event_pol_bits"].dtype == np.uint8
    rf = restore_window(jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None, pf),
        resolution=(32, 32))
    np.testing.assert_array_equal(np.asarray(rf["event_list"]),
                                  window["event_list"])
    np.testing.assert_array_equal(np.asarray(rf["event_valid"]),
                                  window["event_valid"])
    np.testing.assert_array_equal(np.asarray(rf["event_list_pol_mask"]),
                                  window["event_list_pol_mask"])
    np.testing.assert_array_equal(np.asarray(rf["event_cnt"]),
                                  window["event_cnt"])
    out_pf = step(fresh(v["params"]), fresh(v.get("batch_stats", {})),
                  fresh(opt), fresh(states), pf)
    np.testing.assert_allclose(float(out_full[0]), float(out_pf[0]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out_full[1]), jax.tree.leaves(out_pf[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # u16 coord wire on integer-grid events (real sensors): floor the
    # coords — the host cnt is UNCHANGED (the encoders truncate), and the
    # packed roundtrip is bit-exact
    wi = dict(window)
    eli = window["event_list"].copy()
    eli[..., 1:3] = np.floor(eli[..., 1:3])
    wi["event_list"] = eli
    pk = compact_window(wi, "cnt", derive_mask=True, derive_cnt=True,
                        coords_dtype=np.uint16, pol_bits=True)
    assert pk["event_yx"].dtype == np.uint16
    rp = restore_window(jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None, pk),
        resolution=(32, 32))
    np.testing.assert_array_equal(np.asarray(rp["event_list"]), eli)
    np.testing.assert_array_equal(np.asarray(rp["event_cnt"]),
                                  window["event_cnt"])


def test_derive_voxel_matches_loader(dataset):
    """The voxel grids ARE the event list's temporal-bilinear splat times the
    hot mask — the derive_voxel wire rebuilds them on device from REAL
    streamed windows (incl. hot filtering and flips) up to f32 summation
    order (the weights themselves are the identical f32 expressions), the
    derived event_mask is bit-exact, and the jitted step over the grid-free
    wire matches the full window to f32 tolerance."""
    import optax
    from evflow.config import combine_entries
    from evflow.data.h5_stream import H5EventStream
    from evflow.loss.warp_loss import EventWarpingConfig
    from evflow.registry import build_model
    from evflow.train import (compact_window, make_train_step, restore_window,
                              stack_window)

    NB = 5
    cfg = combine_entries(train_cfg(dataset, batch=2))
    cfg["model"]["encoding"] = "voxel"
    cfg["model"]["num_bins"] = NB
    cfg["hot_filter"] = {"enabled": True, "max_px": 4, "min_obvs": 1,
                         "max_rate": 0.05}
    cfg["loader"]["augment"] = ["Horizontal", "Vertical", "Polarity"]
    cfg["loader"]["augment_prob"] = [0.5, 0.5, 0.5]
    stream = H5EventStream(cfg, NB)
    batches = [stream.next_batch() for _ in range(6)]
    stream.close()
    assert any((b["hot_mask"] == 0).any() for b in batches)
    # real voxel grids, not the cnt alias
    assert batches[0]["event_voxel"].shape[-1] == NB

    window = stack_window(batches[:3])
    # the synthetic stream has FRACTIONAL coordinates (the train loop's
    # sticky gate ships those f32 — u16 would truncate the warp loss's
    # bilinear splat coords; the derived GRIDS would still match because
    # the host encoders truncate, see test_derive_cnt_matches_loader)
    cw = compact_window(window, "voxel", derive_mask=True, derive_voxel=True,
                        coords_dtype=np.float32, pol_bits=True)
    assert cw["event_voxel"] is None and cw["event_mask"] is None
    assert cw["event_cnt"] is None  # never rides for voxel encodings
    assert cw["hot_bits"].dtype == np.uint8

    rw = restore_window(
        jax.tree.map(lambda x: jnp.asarray(x) if x is not None else None, cw),
        resolution=(32, 32), num_bins=NB)
    np.testing.assert_allclose(np.asarray(rw["event_voxel"]),
                               window["event_voxel"], atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(rw["event_mask"]),
                                  window["event_mask"])

    model = build_model(cfg["model"])
    B, H, W = 2, 32, 32
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((B, H, W, NB)),
                   jnp.zeros((B, H, W, 2)), states)
    tx = optax.adam(1e-3)
    opt = tx.init(v["params"])
    step = make_train_step(model, tx, EventWarpingConfig(cfg), 4,
                           resolution=(H, W), num_bins=NB)

    def fresh(t):
        return jax.tree.map(jnp.array, t)

    full = dict(window)
    full.pop("hot_mask")
    out_full = step(fresh(v["params"]), fresh(v.get("batch_stats", {})),
                    fresh(opt), fresh(states), full)
    out_dv = step(fresh(v["params"]), fresh(v.get("batch_stats", {})),
                  fresh(opt), fresh(states), cw)
    np.testing.assert_allclose(float(out_full[0]), float(out_dv[0]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(out_full[1]), jax.tree.leaves(out_dv[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_derive_voxel_round_ts():
    """round_encoding parity: the device voxel branch with round_ts=True
    matches np_events_to_voxel(round_ts=True) on a hand-built event set
    (round-half-even in both)."""
    from evflow.data import encodings as enc
    from evflow.train import restore_window

    rng = np.random.default_rng(3)
    N, H, W, NB = 64, 8, 8, 4
    ys = rng.integers(0, H, N).astype(np.float32)
    xs = rng.integers(0, W, N).astype(np.float32)
    # include exact .5 bin positions to pin the rounding convention
    ts = np.concatenate([rng.uniform(0, 1, N - 4).astype(np.float32),
                         np.float32([0.5, 1.0, 1.5, 2.5]) / (NB - 1)])
    ps = rng.choice([-1.0, 1.0], N).astype(np.float32)
    host = enc.np_events_to_voxel(xs, ys, ts, ps, NB, (H, W), round_ts=True)

    window = {
        "event_list": np.stack([ts, ys, xs, ps], -1)[None, None],
        "event_list_pol_mask": np.stack(
            [(ps > 0).astype(np.float32), (ps < 0).astype(np.float32)],
            -1)[None, None],
        "event_valid": np.ones((1, 1, N), np.float32),
        "event_cnt": np.zeros((1, 1, H, W, 2), np.float32),
        "event_voxel": None,
        "event_mask": np.ones((1, 1, H, W, 1), np.float32),
    }
    rw = restore_window(
        jax.tree.map(lambda x: jnp.asarray(x) if x is not None else None,
                     window),
        resolution=(H, W), num_bins=NB, round_ts=True)
    np.testing.assert_allclose(np.asarray(rw["event_voxel"])[0, 0], host,
                               atol=1e-6)


# ---------------------------------------------------------------------------
# device_metrics: the metric protocol computed in-graph (evaluate() fast path)
# ---------------------------------------------------------------------------

def _results_match(r1, r2, rel=1e-5):
    assert set(r1) == set(r2)
    for mname in r1:
        assert set(r1[mname]) == set(r2[mname]), mname
        for fname in r1[mname]:
            assert float(r1[mname][fname]) == pytest.approx(
                float(r2[mname][fname]), rel=rel, abs=1e-7), (mname, fname)


@pytest.mark.parametrize("chunk", [3, 8])
def test_evaluate_device_metrics_matches_host(dataset, tmp_path, chunk):
    """device_metrics computes every metric in-graph inside the chunked
    scan and fetches only [K, B] scalars; per-file results must match the
    host-side metric path (chunk=3 forces partial chunks at sequence
    rollovers, exercising the mixed device/host accumulation)."""
    from evflow.registry import build_model

    cfg = eval_cfg(dataset)
    # every in-graph metric branch: percent metrics, heatmap metrics,
    # scalar-only metrics
    cfg["metrics"]["name"] = [
        "AEE", "NEE", "AAE", "NAAE", "AE_ofMeans", "AAE_Weighted",
        "AAE_Filtered",
    ]
    model = build_model(cfg["model"])
    states = model.init_states(1, 32, 32)
    v = model.init(jax.random.PRNGKey(7), None, jnp.zeros((1, 32, 32, 2)), states)

    r_host = evaluate(cfg, path_results=str(tmp_path / "h"), debug=True,
                      model=model, variables=v, verbose=False, chunk=chunk)
    r_dev = evaluate(cfg, path_results=str(tmp_path / "d"), debug=True,
                     model=model, variables=v, verbose=False, chunk=chunk,
                     device_metrics=True)
    _results_match(r_host, r_dev)


def test_evaluate_device_metrics_b2(dataset, tmp_path):
    """B=2: per-slot cadence counters and per-file accumulation over the
    fetched [K, B] values match the host path."""
    from evflow.registry import build_model

    cfg = eval_cfg(dataset)
    cfg["loader"]["batch_size"] = 2
    cfg["metrics"]["name"] = ["AEE", "AAE"]
    model = build_model(cfg["model"])
    states = model.init_states(2, 32, 32)
    v = model.init(jax.random.PRNGKey(3), None, jnp.zeros((2, 32, 32, 2)), states)

    r_host = evaluate(cfg, path_results=str(tmp_path / "h"), debug=True,
                      model=model, variables=v, verbose=False, chunk=4)
    r_dev = evaluate(cfg, path_results=str(tmp_path / "d"), debug=True,
                     model=model, variables=v, verbose=False, chunk=4,
                     device_metrics=True)
    _results_match(r_host, r_dev)


def test_evaluate_device_metrics_dt4_cadence(dataset, tmp_path):
    """window=0.25 (AEE cadence 4): gating runs host-side over the fetched
    per-window values and must match the host path's due windows."""
    cfg = eval_cfg(dataset)
    cfg["data"] = {"path": dataset, "mode": "gtflow_dt4", "window": 0.25}
    cfg["metrics"] = {"name": ["AEE"], "flow_scaling": 32}
    from evflow.registry import build_model

    model = build_model(cfg["model"])
    states = model.init_states(1, 32, 32)
    v = model.init(jax.random.PRNGKey(5), None, jnp.zeros((1, 32, 32, 2)), states)
    r_host = evaluate(cfg, path_results=str(tmp_path / "h"), debug=True,
                      model=model, variables=v, verbose=False, chunk=4,
                      max_windows=24)
    r_dev = evaluate(cfg, path_results=str(tmp_path / "d"), debug=True,
                     model=model, variables=v, verbose=False, chunk=4,
                     max_windows=24, device_metrics=True)
    _results_match(r_host, r_dev)


def test_evaluate_device_metrics_keep_gt_full_res(dataset, tmp_path):
    """keep_gt_full_res: the nearest-upsample + flow rescale happens
    in-graph on the device path."""
    from evflow.registry import build_model

    cfg = eval_cfg(dataset)
    cfg["loader"]["resolution"] = [16, 16]
    cfg["loader"]["std_resolution"] = [32, 32]
    cfg["loader"]["keep_gt_full_res"] = True
    cfg["metrics"]["name"] = ["AEE", "AAE"]
    model = build_model(cfg["model"])
    states = model.init_states(1, 16, 16)
    v = model.init(jax.random.PRNGKey(9), None, jnp.zeros((1, 16, 16, 2)), states)
    r_host = evaluate(cfg, path_results=str(tmp_path / "h"), debug=True,
                      model=model, variables=v, verbose=False, chunk=4)
    r_dev = evaluate(cfg, path_results=str(tmp_path / "d"), debug=True,
                     model=model, variables=v, verbose=False, chunk=4,
                     device_metrics=True)
    _results_match(r_host, r_dev)


def test_evaluate_device_metrics_heatmap_parity(dataset, tmp_path, monkeypatch):
    """The device carry accumulates (err*mask, mask) sums; the merged
    heatmap aggregate must match the host path's accumulation."""
    from evflow.loss.metrics import _BaseMetric
    from evflow.registry import build_model

    captured = {}
    orig = _BaseMetric.save_error_heatmap

    def capture(self, save_path, **kw):
        avg, count = self.get_final_error_heatmap()
        run = "dev" if f"{os.sep}dev{os.sep}" in save_path else "host"
        captured.setdefault(run, []).append(
            (np.asarray(avg), np.asarray(count))
        )
        return orig(self, save_path, **kw)

    monkeypatch.setattr(_BaseMetric, "save_error_heatmap", capture)

    cfg = eval_cfg(dataset)
    cfg["metrics"]["name"] = ["AEE", "AAE"]
    cfg["metrics"]["heat_map"] = True
    model = build_model(cfg["model"])
    states = model.init_states(1, 32, 32)
    v = model.init(jax.random.PRNGKey(11), None, jnp.zeros((1, 32, 32, 2)), states)

    evaluate(cfg, path_results=str(tmp_path / "host"), debug=False,
             runid="h", model=model, variables=v, verbose=False, chunk=4)
    evaluate(cfg, path_results=str(tmp_path / "dev"), debug=False,
             runid="d", model=model, variables=v, verbose=False, chunk=4,
             device_metrics=True)
    h_maps, d_maps = captured["host"], captured["dev"]
    assert len(h_maps) == len(d_maps) == 2  # AEE + AAE
    for (ha, hc), (da, dc) in zip(h_maps, d_maps):
        np.testing.assert_allclose(hc, dc, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ha, da, rtol=1e-4, atol=1e-6)


def test_evaluate_device_metrics_rejections(dataset, tmp_path):
    """Paths that need flow maps on the host are rejected loudly."""
    cfg = eval_cfg(dataset)
    with pytest.raises(ValueError, match="chunk"):
        evaluate(cfg, path_results=str(tmp_path / "a"), debug=True,
                 verbose=False, device_metrics=True)
    with pytest.raises(ValueError, match="vis"):
        evaluate(cfg, path_results=str(tmp_path / "b"), debug=True,
                 verbose=False, chunk=4, device_metrics=True, collect_vis=True)
    cfg2 = eval_cfg(dataset)
    cfg2["data"] = {"path": dataset, "mode": "gtflow_dt4", "window": 0.25}
    cfg2["metrics"] = {"name": ["AEE"], "flow_scaling": 32, "heat_map": True}
    with pytest.raises(ValueError, match="heat_map"):
        evaluate(cfg2, path_results=str(tmp_path / "c"), debug=True,
                 verbose=False, chunk=4, device_metrics=True)


def test_evaluate_device_metrics_voxel_encoding(dataset, tmp_path):
    """Voxel encoding has no count wire, so the event mask must ride up
    explicitly (the derive_mask elision only applies to plain cnt wires)."""
    from evflow.registry import build_model

    cfg = eval_cfg(dataset)
    cfg["model"]["encoding"] = "voxel"
    cfg["metrics"]["name"] = ["AEE", "AAE"]
    model = build_model(cfg["model"])
    states = model.init_states(1, 32, 32)
    v = model.init(jax.random.PRNGKey(13), jnp.zeros((1, 32, 32, 2)), None,
                   states)
    r_host = evaluate(cfg, path_results=str(tmp_path / "h"), debug=True,
                      model=model, variables=v, verbose=False, chunk=4)
    r_dev = evaluate(cfg, path_results=str(tmp_path / "d"), debug=True,
                     model=model, variables=v, verbose=False, chunk=4,
                     device_metrics=True)
    _results_match(r_host, r_dev)


def test_evaluate_device_metrics_deploy_engine(dataset, tmp_path):
    """The int8 serving engine under device_metrics (the
    eval_flow_quant.py --mode deploy --device_metrics path): integer
    dataflow is deterministic, so results match the engine's host-metric
    run exactly."""
    from evflow.deploy import Int8DeployEngine
    from evflow.registry import build_model

    cfg = eval_cfg(dataset)
    cfg["metrics"]["name"] = ["AEE", "AAE"]
    model = build_model(cfg["model"])
    states = model.init_states(1, 32, 32)
    v = model.init(jax.random.PRNGKey(17), None, jnp.zeros((1, 32, 32, 2)),
                   states)
    engine = Int8DeployEngine(model, v, mem_dtype="bfloat16")
    r_host = evaluate(cfg, path_results=str(tmp_path / "h"), debug=True,
                      model=engine, variables=engine.params, verbose=False,
                      chunk=4)
    r_dev = evaluate(cfg, path_results=str(tmp_path / "d"), debug=True,
                     model=engine, variables=engine.params, verbose=False,
                     chunk=4, device_metrics=True)
    _results_match(r_host, r_dev)
