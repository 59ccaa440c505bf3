"""Pallas fused conv+LIF kernel: parity with the XLA path (interpret mode)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from evflow.models.fused import FusedFireNet
from evflow.ops.lif import leaky_step
from evflow.ops.pallas.conv_lif import fused_conv_lif
from evflow.registry import build_model


def xla_ref(x, mem, w, bias, beta, theta, prev=None, w_rec=None):
    ff = jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias
    if prev is not None:
        ff = ff + jax.lax.conv_general_dilated(
            jnp.asarray(prev, jnp.bfloat16), jnp.asarray(w_rec, jnp.bfloat16),
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
    return leaky_step(ff, jnp.asarray(mem), jnp.asarray(beta), jnp.asarray(theta))


@pytest.fixture
def layer(rng):
    B, H, W, C = 2, 16, 16, 8
    return dict(
        x=rng.normal(size=(B, H, W, C)).astype(np.float32),
        mem=rng.normal(size=(B, H, W, C)).astype(np.float32),
        w=rng.normal(0, 0.1, (3, 3, C, C)).astype(np.float32),
        w_rec=rng.normal(0, 0.1, (3, 3, C, C)).astype(np.float32),
        bias=rng.normal(size=C).astype(np.float32),
        beta=rng.uniform(0, 1, C).astype(np.float32),
        theta=rng.uniform(0.1, 0.8, C).astype(np.float32),
        prev=(rng.uniform(size=(B, H, W, C)) > 0.5).astype(np.float32),
    )


def test_feedforward_matches_xla(layer):
    with pltpu.force_tpu_interpret_mode():
        spk, mem2 = fused_conv_lif(
            jnp.asarray(layer["x"]), jnp.asarray(layer["mem"]), jnp.asarray(layer["w"]),
            jnp.asarray(layer["bias"]), jnp.asarray(layer["beta"]),
            jnp.asarray(layer["theta"]), tile_rows=8,
        )
    rspk, rmem = xla_ref(layer["x"], layer["mem"], layer["w"], layer["bias"],
                         layer["beta"], layer["theta"])
    np.testing.assert_array_equal(np.asarray(spk), np.asarray(rspk))
    np.testing.assert_allclose(np.asarray(mem2), np.asarray(rmem), atol=1e-5)


def test_recurrent_matches_xla(layer):
    with pltpu.force_tpu_interpret_mode():
        spk, mem2 = fused_conv_lif(
            jnp.asarray(layer["x"]), jnp.asarray(layer["mem"]), jnp.asarray(layer["w"]),
            jnp.asarray(layer["bias"]), jnp.asarray(layer["beta"]),
            jnp.asarray(layer["theta"]),
            prev_spk=jnp.asarray(layer["prev"]), w_rec=jnp.asarray(layer["w_rec"]),
            tile_rows=8,
        )
    rspk, rmem = xla_ref(layer["x"], layer["mem"], layer["w"], layer["bias"],
                         layer["beta"], layer["theta"], layer["prev"], layer["w_rec"])
    np.testing.assert_array_equal(np.asarray(spk), np.asarray(rspk))
    np.testing.assert_allclose(np.asarray(mem2), np.asarray(rmem), atol=1e-5)


def test_soft_reset_variant(layer):
    with pltpu.force_tpu_interpret_mode():
        spk, mem2 = fused_conv_lif(
            jnp.asarray(layer["x"]), jnp.asarray(layer["mem"]), jnp.asarray(layer["w"]),
            jnp.asarray(layer["bias"]), jnp.asarray(layer["beta"]),
            jnp.asarray(layer["theta"]), hard_reset=False, tile_rows=8,
        )
    ff = jax.lax.conv_general_dilated(
        jnp.asarray(layer["x"], jnp.bfloat16), jnp.asarray(layer["w"], jnp.bfloat16),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + layer["bias"]
    rspk, rmem = leaky_step(ff, jnp.asarray(layer["mem"]), jnp.asarray(layer["beta"]),
                            jnp.asarray(layer["theta"]), reset="subtract")
    np.testing.assert_array_equal(np.asarray(spk), np.asarray(rspk))
    np.testing.assert_allclose(np.asarray(mem2), np.asarray(rmem), atol=1e-5)


def test_fused_firenet_matches_flax_eval():
    """Full fused model vs. the flax eval forward (bf16 conv tolerance)."""
    cfg = {"name": "LIFFireNet", "num_bins": 2, "base_num_channels": 8,
           "kernel_size": 3, "encoding": "cnt",
           "compute_dtype": "bfloat16",
           "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
    model = build_model(cfg)
    B, H, W = 1, 16, 16
    rng = np.random.default_rng(0)
    cnt = rng.poisson(0.3, (B, H, W, 2)).astype(np.float32)
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.asarray(cnt), states)

    out, flax_states = model.apply(v, None, jnp.asarray(cnt), states, train=False)
    flax_flow = np.asarray(out["flow"][0])

    fused = FusedFireNet.from_firenet(model, v, tile_rows=8)
    fstates = fused.init_states(B, H, W)
    with pltpu.force_tpu_interpret_mode():
        fflow, fstates2 = fused.step(fused.params, jnp.asarray(cnt), fstates)

    # binary spike decisions can flip at the threshold under different bf16
    # accumulation orders, and flips cascade through depth in a spiking net;
    # require tight agreement at the head and near agreement at depth
    diff = np.abs(np.asarray(fflow) - flax_flow)
    assert (diff > 0.05).mean() < 0.02, diff.max()
    agreements = [
        (np.asarray(a.spk) == np.asarray(b.spk)).mean()
        for a, b in zip(fstates2, flax_states)
    ]
    assert agreements[0] > 0.999, agreements
    assert min(agreements) > 0.95, agreements


def test_fused_firenet_multi_step_state_threading():
    cfg = {"name": "LIFFireNet_short", "num_bins": 2, "base_num_channels": 8,
           "kernel_size": 3, "encoding": "cnt",
           "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
    model = build_model(cfg)
    B, H, W = 1, 16, 16
    rng = np.random.default_rng(1)
    cnt = rng.poisson(0.3, (B, H, W, 2)).astype(np.float32)
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.asarray(cnt), states)
    fused = FusedFireNet.from_firenet(model, v, tile_rows=8)
    st = fused.init_states(B, H, W)
    with pltpu.force_tpu_interpret_mode():
        f1, st = fused.step(fused.params, jnp.asarray(cnt), st)
        f2, st = fused.step(fused.params, jnp.asarray(cnt), st)
    # recurrent state must influence the second step
    assert not np.allclose(np.asarray(f1), np.asarray(f2))


def test_fused_evaluate_protocol(tmp_path):
    """evaluate(fused=True) runs the full AEE protocol on the Pallas path."""
    from evflow.data.synthetic import make_dataset
    from evflow.eval import evaluate

    root = str(tmp_path / "d")
    make_dataset(root, num_sequences=1, resolution=(32, 32), events_per_sec=20000,
                 duration=0.4, flows=[(10.0, -5.0)])
    cfg = {
        "data": {"path": root, "mode": "gtflow_dt1", "window": 1},
        "model": {"name": "LIFFireNet_short", "encoding": "cnt", "num_bins": 2,
                  "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
                  "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}},
        "loader": {"resolution": [32, 32], "std_resolution": [32, 32],
                   "batch_size": 1, "augment": [], "seed": 0},
        "hot_filter": {"enabled": False},
        "vis": {"bars": False},
        "metrics": {"name": ["AEE"], "flow_scaling": 32},
        "loss": {},
    }
    with pltpu.force_tpu_interpret_mode():
        results = evaluate(cfg, debug=True, max_windows=3, verbose=False, fused=True)
    assert "AEE" in results
    for v in results["AEE"].values():
        assert np.isfinite(float(v))


def test_fused_firenet_cmajor_layout():
    """Channel-major fused model matches the NHWC fused model."""
    cfg = {"name": "LIFFireNet_short", "num_bins": 2, "base_num_channels": 8,
           "kernel_size": 3, "encoding": "cnt",
           "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
    model = build_model(cfg)
    B, H, W = 1, 16, 16
    rng = np.random.default_rng(2)
    cnt = rng.poisson(0.3, (B, H, W, 2)).astype(np.float32)
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.asarray(cnt), states)

    a = FusedFireNet.from_firenet(model, v, tile_rows=8, layout="nhwc")
    b = FusedFireNet.from_firenet(model, v, tile_rows=8, layout="cmajor")
    with pltpu.force_tpu_interpret_mode():
        fa, _ = a.step(a.params, jnp.asarray(cnt), a.init_states(B, H, W))
        fb, _ = b.step(b.params, jnp.asarray(cnt), b.init_states(B, H, W))
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-5)


def test_wholenet_kernels_match_layer_grid():
    """v7 (layer fori_loop) and v8 (batch-grid) whole-net kernels are
    bit-identical to the v5 layer-grid kernel across steps."""
    from benchmarks.pallas_archive.fused_net_batch import BatchFusedFireNet
    from benchmarks.pallas_archive.fused_net_lgrid import LayerGridFusedFireNet
    from benchmarks.pallas_archive.fused_net_loop2 import LoopFusedFireNet2

    cfg = {"name": "LIFFireNet", "num_bins": 2, "base_num_channels": 8,
           "kernel_size": 3, "encoding": "cnt",
           "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
    model = build_model(cfg)
    B, H, W = 1, 16, 16
    rng = np.random.default_rng(0)
    cnt = jnp.asarray(rng.poisson(0.3, (B, H, W, 2)).astype(np.float32))
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, cnt, states)

    runners = [LayerGridFusedFireNet(model, v, tile_rows=8),
               LoopFusedFireNet2(model, v, tile_rows=8),
               BatchFusedFireNet(model, v, tile_rows=8)]
    sts = [r.init_states(B, H, W) for r in runners]
    with pltpu.force_tpu_interpret_mode():
        for _ in range(2):
            flows = []
            for k, r in enumerate(runners):
                f, sts[k] = r.step(cnt, sts[k])
                flows.append(np.asarray(f))
            np.testing.assert_array_equal(flows[0], flows[1])
            np.testing.assert_array_equal(flows[0], flows[2])


def test_fused_evaluate_sequence_rollover(tmp_path):
    """Sequence rollover inside evaluate(fused=True): carry resets must use
    the FUSED net's state layout (regression: _reset_slot_states built
    FireNet-layout states, which breaks the channel-major fused layout)."""
    from evflow.data.synthetic import make_dataset
    from evflow.eval import evaluate

    root = str(tmp_path / "d")
    make_dataset(root, num_sequences=2, resolution=(32, 32), events_per_sec=20000,
                 duration=0.25, flows=[(10.0, -5.0), (-6.0, 3.0)], gt_hz=10.0)
    cfg = {
        "data": {"path": root, "mode": "gtflow_dt1", "window": 1},
        "model": {"name": "LIFFireNet_short", "encoding": "cnt", "num_bins": 2,
                  "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
                  "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}},
        "loader": {"resolution": [32, 32], "std_resolution": [32, 32],
                   "batch_size": 1, "augment": [], "seed": 0},
        "hot_filter": {"enabled": False},
        "vis": {"bars": False},
        "metrics": {"name": ["AEE"], "flow_scaling": 32},
        "loss": {},
    }
    with pltpu.force_tpu_interpret_mode():
        # run past the first (0.25 s) sequence so a rollover reset fires
        results = evaluate(cfg, debug=True, max_windows=8, verbose=False,
                           fused=True)
    assert len(results["AEE"]) == 2  # both sequences evaluated
    for v in results["AEE"].values():
        assert np.isfinite(float(v))
