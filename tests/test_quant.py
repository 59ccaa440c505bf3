"""Quantization: fake-quant math, state quant, PTQ calibration, QAT grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evflow.quant import calibrate as C
from evflow.quant import fake_quant as Q


def test_ste_round_gradient_is_identity():
    g = jax.grad(lambda x: Q.ste_round(x).sum())(jnp.array([0.3, 1.7]))
    np.testing.assert_array_equal(np.asarray(g), [1.0, 1.0])


def test_fake_quant_symmetric_levels():
    x = jnp.array([-2.0, -1.0, 0.0, 0.5, 1.0, 2.0])
    out = Q.fake_quant_symmetric(x, jnp.float32(1.0 / 127))
    # scale 1/127: values clip to [-1, 1], representable exactly at steps of 1/127
    np.testing.assert_allclose(np.asarray(out), [-1, -1, 0, 64 / 127, 1, 1], rtol=1e-5)


def test_state_quant_default_range():
    """Default membrane quant range is [-250, 1] (SNNtorch_spiking_submodules.py:190-208)."""
    q = Q.state_quant_fn()
    x = jnp.array([-400.0, -250.0, 0.0, 1.0, 5.0])
    out = np.asarray(q(x))
    assert out[0] == -250.0 and out[1] == -250.0
    assert out[3] == 1.0 and out[4] == 1.0
    # 256 levels over [-250, 1]: step ~0.98; 0 snaps to a level near 0
    assert abs(out[2]) <= (251.0 / 255) / 2 + 1e-6


def test_state_quant_is_idempotent():
    q = Q.state_quant_fn()
    x = jnp.linspace(-260, 2, 97)
    once = q(x)
    np.testing.assert_allclose(np.asarray(q(once)), np.asarray(once), atol=1e-5)


def test_quantize_weights_collects_scales():
    params = {"head": {"ff": {"kernel": jnp.array([[0.5, -1.27]])}},
              "beta": jnp.array([0.3])}
    qp, scales = Q.quantize_weights_symmetric(params)
    assert "head/ff/kernel" in scales
    np.testing.assert_allclose(scales["head/ff/kernel"], 1.27 / 127, rtol=1e-6)
    # beta untouched
    np.testing.assert_allclose(np.asarray(qp["beta"]), [0.3], rtol=1e-6)
    # quantized kernel error bounded by scale/2
    err = np.abs(np.asarray(qp["head"]["ff"]["kernel"]) - np.asarray(params["head"]["ff"]["kernel"]))
    assert err.max() <= scales["head/ff/kernel"] / 2 + 1e-7


def test_dynamic_conv_quant_hook():
    hook = Q.dynamic_conv_quant()
    x = jnp.array([-3.0, 0.1, 2.0])
    out = np.asarray(hook(x, "input"))
    assert np.abs(out - np.asarray(x)).max() <= 3.0 / 127 / 2 + 1e-6


def test_quantized_cell_forward():
    from evflow.models.cells import SNNConvLIF

    cell = SNNConvLIF(input_size=2, features=4,
                      state_quant=Q.state_quant_fn(),
                      conv_fake_quant=Q.dynamic_conv_quant())
    x = jnp.ones((1, 8, 8, 2))
    v = cell.init(jax.random.PRNGKey(0), x, None)
    spk, state = cell.apply(v, x, None)
    assert spk.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(state.mem)).all()


def test_qat_gradients_flow_through_quantized_model():
    from evflow.registry import build_model

    cfg = {"name": "LIFFireNet_short", "num_bins": 2, "base_num_channels": 8,
           "kernel_size": 3, "encoding": "cnt",
           "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
    model = build_model(cfg).clone(
        state_quant=Q.state_quant_fn(), conv_fake_quant=Q.dynamic_conv_quant()
    )
    B, H, W = 1, 16, 16
    cnt = jnp.ones((B, H, W, 2))
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, cnt, states)

    def loss(params):
        out, _ = model.apply({"params": params, "batch_stats": v["batch_stats"]},
                             None, cnt, states)
        return (out["flow"][0] ** 2).sum()

    g = jax.grad(loss)(v["params"])
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_recommend_ranges_policy():
    profiles = {
        "0": {"p2_5": -40.0, "p99": 0.9},
        "1": {"p2_5": -5.0, "p99": 0.9},     # shallower than floor -> floored
        "2": {"p2_5": -400.0, "p99": 0.9},   # deeper than -250 -> clipped
    }
    r = C.recommend_ranges(profiles)
    assert r["0"] == (-40.0, 1.0)
    assert r["1"] == (-15.0, 1.0)
    assert r["2"] == (-250.0, 1.0)


def test_build_per_layer_state_quants():
    quants = C.build_per_layer_state_quants({"0": (-50.0, 1.0)}, 3)
    assert quants[0] is not None and quants[1] is None and quants[2] is None
    out = np.asarray(quants[0](jnp.array([-100.0, 0.5])))
    assert out[0] == -50.0


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from evflow.data.synthetic import make_dataset

    root = str(tmp_path_factory.mktemp("synth"))
    make_dataset(root, num_sequences=1, resolution=(32, 32), events_per_sec=20_000,
                 duration=0.4, flows=[(10.0, -5.0)], gt_hz=10.0)
    return root


def quant_eval_cfg(root, mode):
    return {
        "data": {"path": root, "mode": "gtflow_dt1", "window": 1},
        "model": {
            "name": "LIFFireNet_short", "encoding": "cnt", "num_bins": 2,
            "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
            "quantization": {"enabled": True, "PTQ": True, "Conv_only": mode == "conv_only"},
            "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
        },
        "loader": {"resolution": [32, 32], "std_resolution": [32, 32],
                   "batch_size": 1, "augment": [], "seed": 0},
        "hot_filter": {"enabled": False},
        "vis": {"bars": False},
        "metrics": {"name": ["AEE"], "flow_scaling": 32},
        "loss": {},
    }


def test_calibrate_model_ptq_full(dataset):
    from evflow.registry import build_model

    cfg = quant_eval_cfg(dataset, "full")
    model = build_model(cfg["model"])
    B, H, W = 1, 32, 32
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states)
    qmodel, qv = C.calibrate_model_ptq(cfg, v, mode="full")
    out, _ = qmodel.apply(qv, None, jnp.ones((B, H, W, 2)), states)
    assert np.isfinite(np.asarray(out["flow"][0])).all()


def test_profile_membrane_ranges_and_auto_tune(dataset):
    from evflow.data.h5_stream import H5EventStream
    from evflow.registry import build_model

    cfg = quant_eval_cfg(dataset, "full")
    model = build_model(cfg["model"])
    B, H, W = 1, 32, 32
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states)

    stream = H5EventStream(cfg, 2)
    profiles = C.profile_membrane_ranges(model, v, stream, num_batches=3)
    stream.close()
    assert len(profiles) == model.num_units
    for p in profiles.values():
        assert p["min"] <= p["p50"] <= p["max"] + 1e-6

    qmodel, _ = C.calibrate_model_ptq(cfg, v, mode="full", auto_tune=True,
                                      profile_batches=3)
    out, _ = qmodel.apply(v, None, jnp.ones((B, H, W, 2)), states)
    assert np.isfinite(np.asarray(out["flow"][0])).all()


def test_collect_activation_scales(dataset):
    from evflow.data.h5_stream import H5EventStream
    from evflow.registry import build_model

    cfg = quant_eval_cfg(dataset, "full")
    cfg["data"] = {"path": dataset, "mode": "events", "window": 300}
    model = build_model(cfg["model"])
    B, H, W = 1, 32, 32
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states)
    stream = H5EventStream(cfg, 2)
    scales = C.collect_activation_scales(model, v, stream, num_batches=2)
    stream.close()
    assert scales and all(s >= 0 for s in scales.values())


def test_static_conv_quant_hook():
    hook = Q.static_conv_quant({"head/input": 2.0 / 127}, layer="head")
    x = jnp.array([0.5, -1.9, 3.0])
    out = np.asarray(hook(x, "input"))
    # clipped to ±2.0 and on the grid
    assert abs(out[2] - 2.0) < 1e-6
    # unknown tag passes through
    np.testing.assert_array_equal(np.asarray(hook(x, "nope")), np.asarray(x))


def test_collect_activation_scales_unit_keys(dataset):
    """Calibrated scales are keyed per unit/tag, ready for static hooks."""
    from evflow.data.h5_stream import H5EventStream
    from evflow.registry import build_model

    cfg = quant_eval_cfg(dataset, "full")
    cfg["data"] = {"path": dataset, "mode": "events", "window": 300}
    model = build_model(cfg["model"])
    B, H, W = 1, 32, 32
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states)
    stream = H5EventStream(cfg, 2)
    scales = C.collect_activation_scales(model, v, stream, num_batches=3)
    stream.close()
    for u in (*model.unit_names, "pred"):
        assert f"{u}/input" in scales and f"{u}/output" in scales
    # head input is raw event counts -> nonzero scale
    assert scales["head/input"] > 0


def test_calibrate_model_ptq_static_vs_dynamic_diverge(dataset):
    """num_batches > 0 installs calibrated static per-layer hooks; the result
    differs from the dynamic-absmax fallback (num_batches=0) on inputs whose
    absmax departs from the calibration data (reference eval_flow.py:31-47
    static-scale semantics vs per-batch dynamic quantization)."""
    from evflow.registry import build_model

    cfg = quant_eval_cfg(dataset, "conv_only")
    model = build_model(cfg["model"])
    B, H, W = 1, 32, 32
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states)

    q_static, _ = C.calibrate_model_ptq(cfg, v, mode="conv_only", num_batches=3)
    q_dynamic, _ = C.calibrate_model_ptq(cfg, v, mode="conv_only", num_batches=0)
    assert q_static.conv_fake_quant_per_layer is not None
    assert len(q_static.conv_fake_quant_per_layer) == model.num_units + 1
    assert q_dynamic.conv_fake_quant_per_layer is None
    assert q_dynamic.conv_fake_quant is not None

    # an input 100x hotter than calibration: static scales clip it, dynamic
    # absmax rescales per batch -> different flows
    x = jnp.full((B, H, W, 2), 100.0)
    out_s, _ = q_static.apply(v, None, x, states)
    out_d, _ = q_dynamic.apply(v, None, x, states)
    ds = np.asarray(out_s["flow"][0])
    dd = np.asarray(out_d["flow"][0])
    assert np.isfinite(ds).all() and np.isfinite(dd).all()
    assert np.max(np.abs(ds - dd)) > 1e-5


def test_calibration_batches_change_results(dataset):
    """--calibration_batches is live: different budgets -> different scales
    (more batches see more of the stream's dynamic range)."""
    from evflow.data.h5_stream import H5EventStream
    from evflow.registry import build_model

    cfg = quant_eval_cfg(dataset, "full")
    cfg["data"] = {"path": dataset, "mode": "events", "window": 300}
    model = build_model(cfg["model"])
    B, H, W = 1, 32, 32
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states)

    def collect(n):
        stream = H5EventStream(cfg, 2)
        s = C.collect_activation_scales(model, v, stream, num_batches=n)
        stream.close()
        return s

    s1, s8 = collect(1), collect(8)
    assert any(abs(s1[k] - s8[k]) > 1e-12 for k in s1 if k in s8)


def test_sigmoid_cells_apply_conv_fake_quant():
    """The original (sigmoid-leak) cell family honors conv fake-quant hooks
    like the snn family (the reference's brevitas QuantConv2d,
    spiking_submodules.py:69-84)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from evflow.models.cells import ConvLIF, ConvLIFRecurrent

    def coarse(x, kind):
        s = 0.5  # very coarse grid so quantization visibly changes outputs
        return jnp.round(x / s) * s

    for cls in (ConvLIF, ConvLIFRecurrent):
        kw = dict(input_size=2, features=4)
        plain = cls(**kw)
        quant = cls(**kw, conv_fake_quant=coarse)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 2))
        v = plain.init(jax.random.PRNGKey(1), x, None)
        _, st_p = plain.apply(v, x, None)
        _, st_q = quant.apply(v, x, None)
        assert not np.allclose(np.asarray(st_p.mem), np.asarray(st_q.mem)), cls


def test_static_qat_grid_matches_deploy_calibration(dataset):
    """quantization.static_scales installs the SAME calibrated grid in the
    QAT training graph that calibrate_model_ptq installs for deployment —
    the train/serve scale agreement of the reference's brevitas QAT
    (train_flow_quant.py:153-155 + SNNtorch_spiking_submodules.py:177-208).
    Dynamic-absmax QAT has no such guarantee (its scales follow each batch)."""
    from evflow.data.h5_stream import H5EventStream
    from evflow.registry import build_model

    cfg = quant_eval_cfg(dataset, "conv_only")
    cfg["data"] = {"path": dataset, "mode": "events", "window": 300}
    base_cfg = {k: v for k, v in cfg["model"].items() if k != "quantization"}
    base = build_model(base_cfg)
    B, H, W = 1, 32, 32
    states = base.init_states(B, H, W)
    v = base.init(jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states)

    stream = H5EventStream(cfg, 2)
    scales = C.collect_activation_scales(base, v, stream, num_batches=3)
    stream.close()

    qat_cfg = dict(base_cfg)
    qat_cfg["quantization"] = {
        "enabled": True, "PTQ": False, "Conv_only": True,
        "static_scales": {k: float(s) for k, s in scales.items()},
    }
    qat_model = build_model(qat_cfg)
    assert qat_model.conv_fake_quant_per_layer is not None
    assert len(qat_model.conv_fake_quant_per_layer) == base.num_units + 1
    assert qat_model.conv_fake_quant is None

    # the deployment-side PTQ model calibrated on the same stream
    q_deploy, _ = C.calibrate_model_ptq(cfg, v, mode="conv_only", num_batches=3)

    x = jax.random.normal(jax.random.PRNGKey(3), (B, H, W, 2)) * 4.0
    out_qat, _ = qat_model.apply(v, None, x, states)
    out_dep, _ = q_deploy.apply(v, None, x, states)
    np.testing.assert_allclose(
        np.asarray(out_qat["flow"][0]), np.asarray(out_dep["flow"][0]), atol=1e-6
    )

    # dynamic-absmax QAT disagrees with the deployed static grid on the same
    # input — the mismatch static calibration removes
    dyn_cfg = dict(base_cfg)
    dyn_cfg["quantization"] = {"enabled": True, "PTQ": False, "Conv_only": True}
    dyn_model = build_model(dyn_cfg)
    out_dyn, _ = dyn_model.apply(v, None, x, states)
    assert np.max(np.abs(np.asarray(out_dyn["flow"][0])
                         - np.asarray(out_dep["flow"][0]))) > 1e-6
