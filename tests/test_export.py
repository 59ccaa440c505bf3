"""Export: BN folding, StableHLO round-trip, golden .npz parity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evflow import export as E
from evflow.registry import build_model


def test_fold_batchnorm_math(rng):
    k = rng.normal(size=(3, 3, 2, 4)).astype(np.float32)
    scale = rng.uniform(0.5, 2, 4).astype(np.float32)
    bias = rng.normal(size=4).astype(np.float32)
    mean = rng.normal(size=4).astype(np.float32)
    var = rng.uniform(0.5, 2, 4).astype(np.float32)
    fk, fb = E.fold_batchnorm_params(k, scale, bias, mean, var)

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
    conv = lambda kk: jax.lax.conv_general_dilated(
        x, jnp.asarray(kk), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_bn = (conv(k) - mean) / np.sqrt(var + 1e-5) * scale + bias
    y_fold = conv(fk) + fb
    np.testing.assert_allclose(np.asarray(y_bn), np.asarray(y_fold), atol=1e-4)


@pytest.fixture(scope="module")
def trained_like_model():
    cfg = {"name": "LIFFireNet_short", "num_bins": 2, "base_num_channels": 8,
           "kernel_size": 3, "encoding": "cnt",
           "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
    model = build_model(cfg)
    B, H, W = 1, 16, 16
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(3), None, jnp.zeros((B, H, W, 2)), states)
    return model, v


def test_export_variables_structure(trained_like_model):
    model, v = trained_like_model
    emodel, ev = E.export_variables_from_trained(model, v)
    p = ev["params"]
    for name in emodel.unit_names:
        assert f"{name}_ff" in p and "bias" in p[f"{name}_ff"]
        beta = np.asarray(p[f"{name}_beta"])
        assert (beta >= 0).all() and (beta <= 1).all()
        assert (np.asarray(p[f"{name}_threshold"]) >= 0.01).all()
    assert "G1_rec" in p and "G2_rec" in p


def test_export_forward_runs(trained_like_model):
    model, v = trained_like_model
    emodel, ev = E.export_variables_from_trained(model, v)
    B, H, W = 1, 16, 16
    states = emodel.init_states(B, H, W)
    x = jnp.ones((B, H, W, 2))
    flow, ns = emodel.apply(ev, x, states)
    assert flow.shape == (B, H, W, 2)
    assert float(jnp.abs(flow).max()) <= 1.0
    # spikes binary
    for s in ns:
        u = np.unique(np.asarray(s.spk))
        assert set(u) <= {0.0, 1.0}


def test_full_export_and_golden_roundtrip(trained_like_model, tmp_path):
    model, v = trained_like_model
    out = E.export_model(model, v, str(tmp_path / "exported"), batch=1,
                         height=16, width=16)
    assert os.path.exists(out["artifact"])

    # reload the artifact and check golden parity
    emodel, ev = E.export_variables_from_trained(model, v)
    states = emodel.init_states(1, 16, 16)
    gin = np.load(out["inputs.npz"] if "inputs.npz" in out else out["inputs"])
    gout = np.load(out["outputs"])
    x = jnp.asarray(gin["input"])
    res = E.load_and_run_stablehlo(out["artifact"], x, states)
    flow = res[0]
    np.testing.assert_allclose(np.asarray(flow), gout["flow"], atol=1e-6)


def test_lif_layer_export(tmp_path):
    art = E.export_lif_layer(str(tmp_path / "lif"))
    gin = np.load(os.path.join(str(tmp_path / "lif"), "lif_inputs.npz"))
    gout = np.load(os.path.join(str(tmp_path / "lif"), "lif_outputs.npz"))
    spk, mem = E.load_and_run_stablehlo(art, jnp.asarray(gin["x"]), jnp.asarray(gin["mem"]))
    np.testing.assert_allclose(np.asarray(spk), gout["spk"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(mem), gout["mem"], atol=1e-6)


def test_conv_lif_layer_export(tmp_path):
    art = E.export_conv_lif_layer(str(tmp_path / "clif"))
    gin = np.load(os.path.join(str(tmp_path / "clif"), "conv_lif_inputs.npz"))
    gout = np.load(os.path.join(str(tmp_path / "clif"), "conv_lif_outputs.npz"))
    spk, mem = E.load_and_run_stablehlo(art, jnp.asarray(gin["x"]), jnp.asarray(gin["mem"]))
    np.testing.assert_allclose(np.asarray(spk), gout["spk"], atol=1e-5)


def test_exported_streaming_state_consistency(trained_like_model):
    """Two consecutive exported steps: state threads through correctly."""
    model, v = trained_like_model
    emodel, ev = E.export_variables_from_trained(model, v)
    B, H, W = 1, 16, 16
    s0 = emodel.init_states(B, H, W)
    x = jnp.ones((B, H, W, 2)) * 2.0
    f1, s1 = emodel.apply(ev, x, s0)
    f2, s2 = emodel.apply(ev, x, s1)
    assert not np.allclose(np.asarray(f1), np.asarray(f2)) or not np.allclose(
        np.asarray(s1[0].mem), np.asarray(s2[0].mem)
    )


def test_deploy_engine_export_roundtrip(trained_like_model, tmp_path):
    """The int8 serving step exports to StableHLO (real int8 dataflow) and
    the reloaded artifact reproduces its golden outputs bit-exactly."""
    from evflow.deploy import Int8DeployEngine

    model, v = trained_like_model
    engine = Int8DeployEngine(model, v, mem_dtype="int8")
    out = E.export_deploy_engine(engine, str(tmp_path / "dep"), batch=1,
                                 height=16, width=16)
    assert os.path.exists(out["artifact"])
    gin = np.load(out["inputs"])
    gout = np.load(out["outputs"])
    states = engine.init_states(1, 16, 16)
    res = E.load_and_run_stablehlo(out["artifact"], jnp.asarray(gin["input"]), states)
    flow, new_states = res[0], res[1]
    np.testing.assert_array_equal(np.asarray(flow), gout["flow"])
    # int8 carries survive the artifact boundary (G1 = unit 1 is recurrent;
    # FF units carry no spikes)
    assert np.asarray(new_states[1].spk).dtype == np.int8
    np.testing.assert_array_equal(np.asarray(new_states[0].mem), gout["mem_0"])


def test_export_tebn_mean_p_fold():
    """TEBN models export with the per-timestep scale folded as p.mean(0)
    (the flax eval semantics with no timestep); MPBN export raises."""
    from evflow.export import export_variables_from_trained
    from evflow.registry import build_model

    cfg = {"name": "LIFFireNet_short", "encoding": "cnt", "num_bins": 2,
           "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
           "tebn": {"enabled": True, "num_timesteps": 4},
           "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
    m = build_model(cfg)
    st = m.init_states(1, 16, 16)
    v = m.init(jax.random.PRNGKey(0), None, jnp.zeros((1, 16, 16, 2)), st)
    p = v["params"]
    key = jax.random.PRNGKey(1)
    for name in m.unit_names:
        key, k = jax.random.split(key)
        p[name]["bn"]["p"] = jax.random.uniform(
            k, p[name]["bn"]["p"].shape, minval=0.5, maxval=1.5)
    v = {"params": p, "batch_stats": v["batch_stats"]}
    em, ev = export_variables_from_trained(m, v)
    x = jax.random.poisson(jax.random.PRNGKey(2), 0.3, (1, 16, 16, 2)).astype(jnp.float32)
    outf, _ = m.apply(v, None, x, st, train=False)
    flow, _ = em.apply(ev, x, em.init_states(1, 16, 16))
    d = np.abs(np.asarray(outf["flow"][0]) - np.asarray(flow))
    # tanh-flow scale; residual is spike-edge noise, not a missing p factor
    assert d.max() < 0.05, d.max()

    cfg2 = dict(cfg)
    cfg2.pop("tebn")
    cfg2["mpbn"] = {"enabled": True}
    m2 = build_model(cfg2)
    v2 = m2.init(jax.random.PRNGKey(0), None, jnp.zeros((1, 16, 16, 2)),
                 m2.init_states(1, 16, 16))
    with pytest.raises(NotImplementedError, match="MPBN"):
        export_variables_from_trained(m2, v2)
