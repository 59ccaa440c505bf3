"""Pipeline-parallel serving (evflow/parallel/pipeline.py) vs the
sequential int8 engine: bit-exact flows and final state on the virtual
8-CPU mesh for every legal stage count."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evflow.deploy import Int8DeployEngine
from evflow.parallel.pipeline import PipelineServer, make_mesh_pipe
from evflow.registry import build_model


def _engine(C=8, short=False):
    cfg = {
        "name": "LIFFireNet_short" if short else "LIFFireNet",
        "num_bins": 2,
        "base_num_channels": C,
        "kernel_size": 3,
        "encoding": "cnt",
        "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
    }
    model = build_model(cfg)
    B, H, W = 2, 16, 16
    states = model.init_states(B, H, W)
    variables = model.init(
        jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2), jnp.float32), states
    )
    return Int8DeployEngine(model, variables, mem_dtype="bfloat16"), (B, H, W)


def _windows(T, B, H, W, seed=0):
    rng = np.random.default_rng(seed)
    return rng.poisson(0.3, (T, B, H, W, 2)).astype(np.float32)


def _sequential(engine, windows, states):
    flows = []
    for t in range(windows.shape[0]):
        out, states = jax.jit(engine.apply)(
            engine.params, None, jnp.asarray(windows[t]), states
        )
        flows.append(np.asarray(out["flow"][0]))
    return np.stack(flows), states


@pytest.mark.parametrize("stages", [2, 4, 8])
def test_pipeline_matches_sequential(stages):
    engine, (B, H, W) = _engine()
    T = 6
    windows = _windows(T, B, H, W)

    seq_flows, seq_states = _sequential(
        engine, windows, engine.init_states(B, H, W)
    )

    mesh = make_mesh_pipe(stages)
    srv = PipelineServer(engine, mesh)
    assert srv.num_ops == 8 and srv.ops_per_stage == 8 // stages
    pst = srv.init_states(B, H, W)
    flows, pst = srv.serve(windows, pst)
    flows = np.asarray(flows)

    assert flows.shape == seq_flows.shape
    np.testing.assert_array_equal(flows, seq_flows)

    # final membranes / recurrent spikes identical to the sequential run
    unpacked = srv.unpack_states(pst)
    for got, want in zip(unpacked, seq_states):
        np.testing.assert_array_equal(
            np.asarray(got.mem, np.float32), np.asarray(want.mem, np.float32)
        )
        assert (got.spk is None) == (want.spk is None)
        if want.spk is not None:
            np.testing.assert_array_equal(np.asarray(got.spk), np.asarray(want.spk))


def test_chunked_streaming_composes():
    """serve() over two chunks == serve() over the concatenation (fill and
    drain steps are validity-gated, so membranes never see padding)."""
    engine, (B, H, W) = _engine()
    T = 8
    windows = _windows(T, B, H, W, seed=1)
    mesh = make_mesh_pipe(4)
    srv = PipelineServer(engine, mesh)

    f_all, _ = srv.serve(windows, srv.init_states(B, H, W))

    st = srv.init_states(B, H, W)
    f1, st = srv.serve(windows[:3], st)
    f2, st = srv.serve(windows[3:], st)
    np.testing.assert_array_equal(
        np.asarray(f_all), np.concatenate([np.asarray(f1), np.asarray(f2)])
    )


def test_short_pipeline_and_t_shorter_than_pipe():
    """LIFFireNet_short: 6 ops over 3 stages; T < S still drains correctly."""
    engine, (B, H, W) = _engine(short=True)
    T = 2
    windows = _windows(T, B, H, W, seed=2)
    seq_flows, _ = _sequential(engine, windows, engine.init_states(B, H, W))

    mesh = make_mesh_pipe(3)
    srv = PipelineServer(engine, mesh)
    flows, _ = srv.serve(windows, srv.init_states(B, H, W))
    np.testing.assert_array_equal(np.asarray(flows), seq_flows)


def test_rejects_bad_configs():
    engine, (B, H, W) = _engine()
    mesh = make_mesh_pipe(5)
    with pytest.raises(ValueError, match="do not divide"):
        PipelineServer(engine, mesh)

    model = engine.model
    states = model.init_states(B, H, W)
    variables = model.init(
        jax.random.PRNGKey(1), None, jnp.zeros((B, H, W, 2), jnp.float32), states
    )
    mixed = Int8DeployEngine(model, variables, mem_dtype="mixed")
    with pytest.raises(ValueError, match="bf16-membrane"):
        PipelineServer(mixed, make_mesh_pipe(2))


@pytest.mark.parametrize("stages,data", [(2, 4), (4, 2)])
def test_pipe_times_data_matches_sequential(stages, data):
    """Composed pipe x data mesh: batch slots shard over the data axis
    while each stage's unit group replicates — still bit-exact vs the
    sequential engine, and chunked streaming still composes."""
    engine, (B, H, W) = _engine()
    B = 4  # shard over the data axis
    T = 6
    windows = _windows(T, B, H, W, seed=3)
    seq_flows, seq_states = _sequential(
        engine, windows, engine.init_states(B, H, W)
    )

    mesh = make_mesh_pipe(stages, data=data)
    # pipe neighbors must stay adjacent in device order (the ppermute axis)
    devs = np.asarray(mesh.devices)
    assert devs[1, 0].id == devs[0, 0].id + 1
    srv = PipelineServer(engine, mesh)
    assert srv.S == stages and srv.D == data
    flows, states = srv.serve(windows, srv.init_states(B, H, W))
    np.testing.assert_array_equal(np.asarray(flows), seq_flows)
    for got, want in zip(srv.unpack_states(states), seq_states):
        np.testing.assert_array_equal(
            np.asarray(got.mem, dtype=np.float32),
            np.asarray(want.mem, dtype=np.float32),
        )

    # chunked streaming composes under the data axis too: data-sharded
    # states re-fed across serve() calls match the one-shot run
    st = srv.init_states(B, H, W)
    f1, st = srv.serve(windows[:2], st)
    f2, st = srv.serve(windows[2:], st)
    np.testing.assert_array_equal(
        np.asarray(flows), np.concatenate([np.asarray(f1), np.asarray(f2)])
    )

    # B that does not shard is rejected loudly
    with pytest.raises(ValueError, match="does not shard"):
        srv.serve(_windows(2, 3, H, W), srv.init_states(3, H, W))
