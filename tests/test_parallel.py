"""Multi-device data parallelism on the forced 8-CPU mesh (SURVEY §2.9/§5.8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from evflow.data.synthetic import make_dataset
from evflow.parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    make_dataset(root, num_sequences=2, resolution=(32, 32), events_per_sec=30_000,
                 duration=0.5, flows=[(10.0, -5.0), (-8.0, 4.0)], gt_hz=10.0)
    return root


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_places_batch_axis():
    mesh = make_mesh()
    batch = {"x": np.ones((8, 4, 4)), "s": np.float32(1.0)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding.spec == P("data")
    # scalar replicated
    assert out["s"].sharding.spec == P()


def test_sharded_forward_matches_single_device(dataset):
    """Same params, batch split over 8 devices vs single device — identical flows."""
    from evflow.registry import build_model

    cfg = {"name": "LIFFireNet_short", "num_bins": 2, "base_num_channels": 8,
           "kernel_size": 3, "encoding": "cnt",
           "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
    model = build_model(cfg)
    B, H, W = 8, 16, 16
    rng = np.random.default_rng(0)
    cnt = rng.normal(size=(B, H, W, 2)).astype(np.float32)
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.asarray(cnt), states)

    out_single, _ = jax.jit(
        lambda v, c, s: model.apply(v, None, c, s)
    )(v, jnp.asarray(cnt), states)

    mesh = make_mesh()
    bs = batch_sharding(mesh)
    cnt_sh = jax.device_put(cnt, bs)
    states_sh = jax.tree.map(lambda x: jax.device_put(x, bs), states)
    v_rep = replicate(v, mesh)
    out_sharded, _ = jax.jit(
        lambda v, c, s: model.apply(v, None, c, s)
    )(v_rep, cnt_sh, states_sh)

    np.testing.assert_allclose(
        np.asarray(out_single["flow"][0]), np.asarray(out_sharded["flow"][0]), atol=1e-5
    )


def test_data_parallel_grads_match_single_device():
    """Summed-loss gradient under an 8-way sharded batch == single-device grads
    (GSPMD inserts the all-reduce)."""
    from evflow.models.cells import SNNConvLIF

    cell = SNNConvLIF(input_size=2, features=4)
    B, H, W = 8, 8, 8
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, H, W, 2)).astype(np.float32)
    v = cell.init(jax.random.PRNGKey(0), jnp.asarray(x), None)

    def loss(params, x):
        out, _ = cell.apply({"params": params, "batch_stats": v["batch_stats"]}, x, None)
        return (out * out).sum()

    g_single = jax.grad(loss)(v["params"], jnp.asarray(x))

    mesh = make_mesh()
    x_sh = jax.device_put(x, batch_sharding(mesh))
    p_rep = replicate(v["params"], mesh)
    g_sharded = jax.jit(jax.grad(loss))(p_rep, x_sh)

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_train_on_mesh(dataset, tmp_path):
    """Full TBPTT train step under an 8-way data mesh."""
    from tests.test_train_eval import train_cfg
    from evflow.train import train

    cfg = train_cfg(dataset, batch=8)
    mesh = make_mesh()
    run = train(cfg, path_runs=str(tmp_path / "runs"), max_steps=3, mesh=mesh,
                verbose=False)
    assert run is not None


def test_eval_fanout_batched_sequences(dataset, tmp_path):
    """Batched eval across sequences: batch slots stream different files
    (the reference's per-slot assignment, now one slot per shard)."""
    from tests.test_train_eval import eval_cfg
    from evflow.eval import evaluate

    cfg = eval_cfg(dataset)
    cfg["loader"]["batch_size"] = 2
    results = evaluate(cfg, path_results=str(tmp_path / "r"), debug=True,
                       max_windows=8, verbose=False)
    # both sequences contribute results
    assert len(results["AEE"]) == 2


def test_deploy_engine_sharded_serving():
    """The int8 serving engine fans out over the data mesh: batch-of-
    sequences sharded, prepared int8 params replicated — flows match the
    single-device engine exactly (integer GEMMs are deterministic)."""
    from evflow.deploy import Int8DeployEngine
    from evflow.registry import build_model

    cfg = {"name": "LIFFireNet_short", "num_bins": 2, "base_num_channels": 8,
           "kernel_size": 3, "encoding": "cnt",
           "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
    model = build_model(cfg)
    B, H, W = 8, 16, 16
    rng = np.random.default_rng(1)
    cnt = rng.poisson(0.3, size=(B, H, W, 2)).astype(np.float32)
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.asarray(cnt), states)
    engine = Int8DeployEngine(model, v, mem_dtype="int8")
    est = engine.init_states(B, H, W)

    out_single, st_single = jax.jit(
        lambda p, c, s: engine.apply(p, None, c, s)
    )(engine.params, jnp.asarray(cnt), est)

    mesh = make_mesh()
    bs = batch_sharding(mesh)
    cnt_sh = jax.device_put(cnt, bs)
    est_sh = jax.tree.map(lambda x: jax.device_put(x, bs), est)
    p_rep = replicate(engine.params, mesh)
    out_sh, st_sh = jax.jit(
        lambda p, c, s: engine.apply(p, None, c, s)
    )(p_rep, cnt_sh, est_sh)

    # G1 (unit 1) is recurrent and carries its spikes; FF units carry None
    np.testing.assert_array_equal(
        np.asarray(st_single[1].spk), np.asarray(st_sh[1].spk)
    )
    assert st_single[0].spk is None
    np.testing.assert_allclose(
        np.asarray(out_single["flow"][0]), np.asarray(out_sh["flow"][0]), atol=1e-5
    )


def test_unet_engine_sharded_serving():
    """The UNet int8 engine fans out over the data mesh exactly like the
    FireNet engine: batch-of-sequences sharded, prepared params replicated
    — all four multires flows match single-device (integer grids are
    deterministic; the flat LIFState tuple is batch-leading on every
    slot, so batch sharding propagates through the whole net)."""
    from evflow.deploy_unet import Int8UNetEngine
    from evflow.registry import build_model

    cfg = {"name": "SpikingRecEVFlowNet", "num_bins": 2,
           "base_num_channels": 4, "kernel_size": 3, "encoding": "cnt",
           "mask_output": True,
           "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.0]}}
    model = build_model(cfg)
    B, H, W = 8, 32, 32
    rng = np.random.default_rng(1)
    cnt = rng.poisson(0.3, size=(B, H, W, 2)).astype(np.float32)
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.asarray(cnt), states)
    engine = Int8UNetEngine(model, v)
    est = engine.init_states(B, H, W)

    out_single, st_single = jax.jit(
        lambda p, c, s: engine.apply(p, None, c, s)
    )(engine.params, jnp.asarray(cnt), est)

    mesh = make_mesh()
    bs = batch_sharding(mesh)
    cnt_sh = jax.device_put(cnt, bs)
    est_sh = jax.tree.map(lambda x: jax.device_put(x, bs), est)
    p_rep = replicate(engine.params, mesh)
    out_sh, st_sh = jax.jit(
        lambda p, c, s: engine.apply(p, None, c, s)
    )(p_rep, cnt_sh, est_sh)

    for a, b in zip(out_single["flow"], out_sh["flow"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for sa, sb in zip(st_single, st_sh):
        np.testing.assert_array_equal(
            np.asarray(sa.spk, np.float32), np.asarray(sb.spk, np.float32))


def test_spatial_sharded_flax_matches_single_device():
    """DP x SP 2x4 mesh: batch over `data`, image rows over `space`; GSPMD
    inserts the 3x3-conv halo exchanges (evflow/parallel/spatial.py). Flows
    match the single-device model."""
    from evflow.parallel.spatial import (
        make_mesh_2d, shard_image_batch, spatial_jit_step)
    from evflow.registry import build_model

    cfg = {"name": "LIFFireNet_short", "num_bins": 2, "base_num_channels": 8,
           "kernel_size": 3, "encoding": "cnt",
           "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
    model = build_model(cfg)
    B, H, W = 2, 32, 32
    rng = np.random.default_rng(2)
    cnt = rng.poisson(0.3, size=(B, H, W, 2)).astype(np.float32)
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.asarray(cnt), states)

    out_single, st_single = jax.jit(
        lambda v, c, s: model.apply(v, None, c, s)
    )(v, jnp.asarray(cnt), states)

    mesh = make_mesh_2d(2, 4)
    cnt_sh = shard_image_batch(cnt, mesh)
    st_sh = shard_image_batch(states, mesh)
    assert cnt_sh.sharding.spec == P("data", "space")
    step = spatial_jit_step(lambda v, c, s: model.apply(v, None, c, s), mesh)
    out_sp, st_sp = step(v, cnt_sh, st_sh)
    np.testing.assert_allclose(
        np.asarray(out_single["flow"][0]), np.asarray(out_sp["flow"][0]),
        atol=1e-5,
    )
    # carried membrane state is also row-sharded and identical
    np.testing.assert_allclose(
        np.asarray(st_single[1].mem), np.asarray(st_sp[1].mem), atol=1e-5
    )


def test_spatial_sharded_deploy_engine_exact():
    """Pure SP (1x8) on the int8 serving engine: rows sharded 8-way; the
    dy shift-add partitions with collective-permute halos; integer GEMMs
    make the match exact."""
    from evflow.deploy import Int8DeployEngine
    from evflow.parallel.spatial import (
        make_mesh_2d, shard_image_batch, spatial_jit_step)
    from evflow.registry import build_model

    cfg = {"name": "LIFFireNet_short", "num_bins": 2, "base_num_channels": 8,
           "kernel_size": 3, "encoding": "cnt",
           "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
    model = build_model(cfg)
    B, H, W = 1, 32, 32
    rng = np.random.default_rng(3)
    cnt = rng.poisson(0.3, size=(B, H, W, 2)).astype(np.float32)
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(0), None, jnp.asarray(cnt), states)
    engine = Int8DeployEngine(model, v, mem_dtype="mixed")
    est = engine.init_states(B, H, W)

    out_single, _ = jax.jit(
        lambda p, c, s: engine.apply(p, None, c, s)
    )(engine.params, jnp.asarray(cnt), est)

    mesh = make_mesh_2d(1, 8)
    cnt_sh = shard_image_batch(cnt, mesh)
    est_sh = shard_image_batch(est, mesh)
    step = spatial_jit_step(lambda p, c, s: engine.apply(p, None, c, s), mesh)
    out_sp, st_sp = step(engine.params, cnt_sh, est_sh)
    np.testing.assert_array_equal(
        np.asarray(out_single["flow"][0]), np.asarray(out_sp["flow"][0])
    )
    # int8 membranes stay row-sharded on device
    assert st_sp[1].mem.dtype == jnp.int8


def test_spatial_grads_match_single_device():
    """Training under SP: gradient of a conv+LIF cell with rows sharded
    4-way equals the single-device gradient (halo exchange in fwd+bwd)."""
    from evflow.models.cells import SNNConvLIF
    from evflow.parallel.spatial import make_mesh_2d, shard_image_batch

    cell = SNNConvLIF(input_size=2, features=4)
    B, H, W = 2, 16, 16
    rng = np.random.default_rng(4)
    x = rng.normal(size=(B, H, W, 2)).astype(np.float32)
    v = cell.init(jax.random.PRNGKey(0), jnp.asarray(x), None)

    def loss(params, x):
        out, _ = cell.apply({"params": params, "batch_stats": v["batch_stats"]}, x, None)
        return (out * out).sum()

    g_single = jax.grad(loss)(v["params"], jnp.asarray(x))

    mesh = make_mesh_2d(2, 4)
    x_sh = shard_image_batch(x, mesh)
    g_sp = jax.jit(jax.grad(loss))(v["params"], x_sh)
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dryrun_multichip_entry(capsys):
    """The driver's multi-chip dry run must execute on a real n-device mesh
    (regression: env-var platform forcing was silently ignored and the
    'mesh' ran on one device)."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip(8):" in out and out.strip().endswith("OK")
    assert "dp x sp mesh (4x2)" in out


def test_shard_window_process_local_matches_device_put():
    """_shard_window's multi-process path (make_array_from_process_local_data,
    the only construction valid when mesh devices are non-addressable,
    SURVEY §5.8) builds the same global arrays as the single-process
    device_put path when process_count == 1."""
    from evflow.train import _shard_window

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    window = {
        "event_cnt": rng.random((2, 8, 4, 4, 2)).astype(np.float32),
        "event_voxel": None,  # compact wire drops the dead encoding
        "event_mask": (rng.random((2, 8, 4, 4, 1)) > 0.5).astype(np.uint8),
    }
    a = _shard_window(dict(window), mesh, use_process_local=False)
    b = _shard_window(dict(window), mesh, use_process_local=True)
    assert b["event_voxel"] is None
    for k in ("event_cnt", "event_mask"):
        assert a[k].sharding.is_equivalent_to(b[k].sharding, a[k].ndim)
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].dtype == b[k].dtype


def test_evaluate_mesh_fanout_matches_single_device(tmp_path, dataset):
    """evaluate(mesh=...) shards batch slots over the data mesh (SURVEY
    §5.8 eval fan-out: each chip streams different sequences); per-file
    metrics match single-device evaluation."""
    from evflow.eval import evaluate
    from evflow.registry import build_model

    cfg = {
        "data": {"path": dataset, "mode": "gtflow_dt1", "window": 1},
        "model": {"name": "LIFFireNet_short", "encoding": "cnt", "num_bins": 2,
                  "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
                  "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}},
        "loader": {"resolution": [32, 32], "std_resolution": [32, 32],
                   "batch_size": 2, "augment": [], "seed": 0},
        "hot_filter": {"enabled": False},
        "vis": {"bars": False},
        "metrics": {"name": ["AEE", "AAE"], "flow_scaling": 32},
        "loss": {},
    }
    model = build_model(cfg["model"])
    states = model.init_states(2, 32, 32)
    v = model.init(jax.random.PRNGKey(3), None, jnp.zeros((2, 32, 32, 2)), states)

    r1 = evaluate(cfg, model=model, variables=v, debug=True, verbose=False)
    rm = evaluate(cfg, model=model, variables=v, debug=True, verbose=False,
                  mesh=make_mesh(2))
    assert set(r1["AEE"]) == set(rm["AEE"]) and len(r1["AEE"]) == 2
    for mname in ("AEE", "AAE"):
        for fname in r1[mname]:
            assert float(r1[mname][fname]) == pytest.approx(
                float(rm[mname][fname]), rel=1e-5), (mname, fname)
    # chunked + mesh compose
    rc = evaluate(cfg, model=model, variables=v, debug=True, verbose=False,
                  mesh=make_mesh(2), chunk=4)
    for fname in r1["AEE"]:
        assert float(r1["AEE"][fname]) == pytest.approx(
            float(rc["AEE"][fname]), rel=1e-5), fname


def test_make_mesh_rejects_too_few_devices():
    with pytest.raises(ValueError, match="reports"):
        make_mesh(1000)


def test_evaluate_rejects_fused_with_mesh(dataset):
    """The Pallas fused backend has no GSPMD partitioning — evaluate must
    reject the combination instead of failing opaquely inside Mosaic."""
    from evflow.eval import evaluate

    cfg = {
        "data": {"path": dataset, "mode": "gtflow_dt1", "window": 1},
        "model": {"name": "LIFFireNet_short", "encoding": "cnt", "num_bins": 2,
                  "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
                  "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}},
        "loader": {"resolution": [32, 32], "std_resolution": [32, 32],
                   "batch_size": 2, "augment": [], "seed": 0},
        "hot_filter": {"enabled": False}, "vis": {"bars": False},
        "metrics": {"name": ["AEE"], "flow_scaling": 32}, "loss": {},
    }
    with pytest.raises(ValueError, match="fused.*mesh|mesh.*fused"):
        evaluate(cfg, debug=True, verbose=False, fused=True, mesh=make_mesh(2))


def test_eval_fanout_device_metrics_matches_single(dataset, tmp_path):
    """evaluate(mesh=..., chunk=K, device_metrics=True): the in-graph
    metric protocol under batch fan-out — GT/mask uploads ride the chunk
    sharding, metric reductions cross the mesh via GSPMD — must match the
    single-device device_metrics run per file."""
    from tests.test_train_eval import eval_cfg
    from evflow.eval import evaluate
    from evflow.registry import build_model

    cfg = eval_cfg(dataset)
    cfg["loader"]["batch_size"] = 2
    cfg["metrics"]["name"] = ["AEE", "AAE"]
    model = build_model(cfg["model"])
    states = model.init_states(2, 32, 32)
    v = model.init(jax.random.PRNGKey(21), None, jnp.zeros((2, 32, 32, 2)),
                   states)

    r_single = evaluate(cfg, path_results=str(tmp_path / "s"), debug=True,
                        model=model, variables=v, verbose=False, chunk=4,
                        device_metrics=True)
    mesh = make_mesh(2)
    r_mesh = evaluate(cfg, path_results=str(tmp_path / "m"), debug=True,
                      model=model, variables=v, verbose=False, chunk=4,
                      device_metrics=True, mesh=mesh)
    assert set(r_single["AEE"]) == set(r_mesh["AEE"])
    for mname in ("AEE", "AAE"):
        for fname in r_single[mname]:
            assert float(r_single[mname][fname]) == pytest.approx(
                float(r_mesh[mname][fname]), rel=1e-5), (mname, fname)
