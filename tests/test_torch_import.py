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


def make_unet_state_dict(C=4, num_bins=2, E=4, R=2):
    """Synthesize a SpikingRecEVFlowNet state_dict (models/model.py:723-858:
    multires_unetrec.{encoders.N.conv|recurrent_block, resblocks.N.conv1|
    conv2, decoders.N.conv2d, preds.N.conv2d}; ConvLIF params ff.weight +
    leak/thresh [C,1,1], spiking_submodules.py:58-68)."""
    rng = np.random.default_rng(1)
    sd = {}

    def cell(prefix, cin, cout, rec=False):
        sd[f"{prefix}.ff.weight"] = torch.tensor(
            rng.normal(0, 0.1, (cout, cin, 3, 3)).astype(np.float32))
        if rec:
            sd[f"{prefix}.rec.weight"] = torch.tensor(
                rng.normal(0, 0.1, (cout, cout, 3, 3)).astype(np.float32))
        sd[f"{prefix}.leak"] = torch.tensor(
            rng.normal(-4, 0.1, (cout, 1, 1)).astype(np.float32))
        sd[f"{prefix}.thresh"] = torch.tensor(
            rng.uniform(0.5, 1.0, (cout, 1, 1)).astype(np.float32))

    ins = [C * 2 ** i for i in range(E)]
    outs = [C * 2 ** (i + 1) for i in range(E)]
    for i in range(E):
        cin = num_bins if i == 0 else ins[i]
        cell(f"multires_unetrec.encoders.{i}.conv", cin, outs[i])
        cell(f"multires_unetrec.encoders.{i}.recurrent_block",
             outs[i], outs[i], rec=True)
    for i in range(R):
        cell(f"multires_unetrec.resblocks.{i}.conv1", outs[-1], outs[-1])
        cell(f"multires_unetrec.resblocks.{i}.conv2", outs[-1], outs[-1])
    for i in range(E):
        cx = list(reversed(outs))[i]
        cout = list(reversed(ins))[i]
        cin = 2 * cx + (0 if i == 0 else 2)
        cell(f"multires_unetrec.decoders.{i}.conv2d", cin, cout)
        sd[f"multires_unetrec.preds.{i}.conv2d.weight"] = torch.tensor(
            rng.normal(0, 0.01, (2, cout, 1, 1)).astype(np.float32))
        sd[f"multires_unetrec.preds.{i}.conv2d.bias"] = torch.tensor(
            np.zeros(2, np.float32))
    return sd


def test_import_unet_checkpoint(tmp_path):
    """The torch shim maps a reference SpikingRecEVFlowNet .pth onto the
    flax tree completely (no leftover keys) and the imported model runs."""
    cfg = {"name": "SpikingRecEVFlowNet", "num_bins": 2,
           "base_num_channels": 4, "kernel_size": 3, "encoding": "cnt",
           "mask_output": True,
           "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.0]}}
    m = build_model(cfg)
    states = m.init_states(1, 32, 32)
    v = m.init(jax.random.PRNGKey(0), None, jnp.zeros((1, 32, 32, 2)), states)

    sd = make_unet_state_dict()
    path = str(tmp_path / "unet.pth")
    torch.save({"model_state_dict": sd}, path)
    out, leftover = import_torch_checkpoint(path, v)
    assert leftover == []
    u = out["params"]["multires_unetrec"]
    np.testing.assert_allclose(
        u["encoder0"]["conv"]["ff"]["kernel"],
        np.transpose(sd["multires_unetrec.encoders.0.conv.ff.weight"].numpy(),
                     (2, 3, 1, 0)), atol=1e-7)
    np.testing.assert_allclose(
        u["encoder1"]["recurrent_block"]["rec"]["kernel"],
        np.transpose(
            sd["multires_unetrec.encoders.1.recurrent_block.rec.weight"].numpy(),
            (2, 3, 1, 0)), atol=1e-7)
    np.testing.assert_allclose(
        u["resblock1"]["conv2"]["leak"],
        sd["multires_unetrec.resblocks.1.conv2.leak"].numpy().ravel(),
        atol=1e-7)
    np.testing.assert_allclose(
        u["decoder3"]["conv2d"]["thresh"],
        sd["multires_unetrec.decoders.3.conv2d.thresh"].numpy().ravel(),
        atol=1e-7)
    np.testing.assert_allclose(
        u["pred2"]["conv2d"]["kernel"],
        np.transpose(sd["multires_unetrec.preds.2.conv2d.weight"].numpy(),
                     (2, 3, 1, 0)), atol=1e-7)

    # the imported model runs and deploys
    out_f, _ = m.apply({"params": out["params"]}, None,
                       jnp.ones((1, 32, 32, 2)), states, train=False)
    assert all(np.isfinite(np.asarray(f)).all() for f in out_f["flow"])
    from evflow.deploy_unet import Int8UNetEngine

    eng = Int8UNetEngine(m, {"params": out["params"]})
    oe, _ = eng.apply(eng.params, None, jnp.ones((1, 32, 32, 2)),
                      eng.init_states(1, 32, 32))
    assert all(np.isfinite(np.asarray(f)).all() for f in oe["flow"])
