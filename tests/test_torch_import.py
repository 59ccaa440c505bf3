"""Reference PyTorch checkpoint import (utils/utils.py:9-87 load_model shim)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from evflow.registry import build_model
from evflow.utils.checkpoint import import_torch_checkpoint


def make_reference_state_dict(C=8, num_bins=2, units=("head", "G1", "R1a", "G2", "R2a"),
                              rec_units=("G1", "G2"), ptq_layout=False):
    """Synthesize a state_dict with the reference's key layout
    (SNNtorch_ConvLIF modules: ff.weight, lif.beta, lif.threshold, bn.*)."""
    rng = np.random.default_rng(0)
    sd = {}
    for u in units:
        cin = num_bins if u == "head" else C
        sd[f"{u}.ff.weight"] = torch.tensor(
            rng.normal(0, 0.1, (C, cin, 3, 3)).astype(np.float32))
        if u in rec_units:
            sd[f"{u}.rec.weight"] = torch.tensor(
                rng.normal(0, 0.1, (C, C, 3, 3)).astype(np.float32))
        prefix = f"{u}." if ptq_layout else f"{u}.lif."
        sd[f"{prefix}beta"] = torch.tensor(
            rng.uniform(0, 1, (C, 1, 1)).astype(np.float32))
        sd[f"{prefix}threshold"] = torch.tensor(
            rng.uniform(0.1, 0.8, (C, 1, 1)).astype(np.float32))
        sd[f"{u}.bn.weight"] = torch.tensor(rng.uniform(0.5, 2, C).astype(np.float32))
        sd[f"{u}.bn.bias"] = torch.tensor(rng.normal(0, 0.1, C).astype(np.float32))
        sd[f"{u}.bn.running_mean"] = torch.tensor(rng.normal(0, 0.1, C).astype(np.float32))
        sd[f"{u}.bn.running_var"] = torch.tensor(rng.uniform(0.5, 2, C).astype(np.float32))
        sd[f"{u}.bn.num_batches_tracked"] = torch.tensor(10)
    sd["pred.conv2d.weight"] = torch.tensor(
        rng.normal(0, 0.01, (2, C, 1, 1)).astype(np.float32))
    sd["pred.conv2d.bias"] = torch.tensor(np.zeros(2, np.float32))
    return sd


@pytest.fixture
def model_and_vars():
    cfg = {"name": "LIFFireNet_short", "num_bins": 2, "base_num_channels": 8,
           "kernel_size": 3, "encoding": "cnt",
           "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
    m = build_model(cfg)
    states = m.init_states(1, 16, 16)
    v = m.init(jax.random.PRNGKey(0), None, jnp.zeros((1, 16, 16, 2)), states)
    return m, v


def test_import_reference_checkpoint(tmp_path, model_and_vars):
    m, v = model_and_vars
    sd = make_reference_state_dict()
    path = str(tmp_path / "model.pth")
    torch.save({"model_state_dict": sd, "epoch": 7, "loss": 0.5}, path)

    out, leftover = import_torch_checkpoint(path, v)
    p = out["params"]
    # conv kernel transposed OIHW -> HWIO
    w_torch = sd["head.ff.weight"].numpy()
    np.testing.assert_allclose(
        p["head"]["ff"]["kernel"], np.transpose(w_torch, (2, 3, 1, 0)), atol=1e-7)
    # LIF params flattened per channel
    np.testing.assert_allclose(
        p["G1"]["beta"], sd["G1.lif.beta"].numpy().ravel(), atol=1e-7)
    # BN stats land in batch_stats
    np.testing.assert_allclose(
        out["batch_stats"]["head"]["bn"]["BatchNorm_0"]["var"],
        sd["head.bn.running_var"].numpy(), atol=1e-7)
    # pred conv + bias
    np.testing.assert_allclose(
        p["pred"]["conv2d"]["kernel"],
        np.transpose(sd["pred.conv2d.weight"].numpy(), (2, 3, 1, 0)), atol=1e-7)
    # only BN bookkeeping left over
    assert all("num_batches_tracked" in k for k in leftover)


def test_import_ptq_layout(tmp_path, model_and_vars):
    """PTQ checkpoints store LIF params at <unit>.beta (utils/utils.py:44-70)."""
    m, v = model_and_vars
    sd = make_reference_state_dict(ptq_layout=True)
    path = str(tmp_path / "ptq.pth")
    torch.save(sd, path)  # raw state_dict, no wrapper
    out, _ = import_torch_checkpoint(path, v)
    np.testing.assert_allclose(
        out["params"]["R1a"]["beta"], sd["R1a.beta"].numpy().ravel(), atol=1e-7)


def test_imported_model_runs(tmp_path, model_and_vars):
    m, v = model_and_vars
    sd = make_reference_state_dict()
    path = str(tmp_path / "model.pth")
    torch.save({"model_state_dict": sd}, path)
    out, _ = import_torch_checkpoint(path, v)
    states = m.init_states(1, 16, 16)
    res, _ = m.apply(out, None, jnp.ones((1, 16, 16, 2)), states)
    assert np.isfinite(np.asarray(res["flow"][0])).all()


def test_imported_checkpoint_feeds_deploy_engine(tmp_path, model_and_vars):
    """A reference .pth goes straight into the int8 serving engine — the
    migration path for users of the reference repo."""
    from evflow.deploy import Int8DeployEngine

    m, v = model_and_vars
    sd = make_reference_state_dict()
    path = str(tmp_path / "model.pth")
    torch.save({"model_state_dict": sd, "epoch": 7, "loss": 0.5}, path)
    variables, leftover = import_torch_checkpoint(path, v)
    engine = Int8DeployEngine(m, variables, mem_dtype="int8")
    est = engine.init_states(1, 16, 16)
    cnt = jnp.ones((1, 16, 16, 2), jnp.float32)
    out, est = engine.apply(engine.params, None, cnt, est)
    flow = np.asarray(out["flow"][0])
    assert flow.shape == (1, 16, 16, 2) and np.isfinite(flow).all()
    # BN folding consumed the imported running stats: engine biases reflect
    # the reference bn.bias - running_mean * g, not zeros
    assert float(np.abs(np.asarray(engine.params["units"][0]["bias"],
                                   np.float32)).sum()) > 0
