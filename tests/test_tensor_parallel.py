"""Tensor (channel) parallelism on the forced 8-CPU mesh.

The TP axis shards conv output channels, per-channel LIF params, and the
[B, H, W, C] activation/state tensors over a ``model`` mesh axis
(evflow/parallel/tensor.py); GSPMD inserts the channel collectives. These
tests pin numerical parity with the unsharded forward/backward — a new
capability vs. the reference (strictly single-GPU, SURVEY.md §2.9).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from evflow.parallel.tensor import (
    channel_shardings,
    make_mesh_tp,
    param_shardings,
    shard_channel_tree,
    tp_jit_step,
)
from evflow.registry import build_model

CFG = {
    "name": "LIFFireNet",
    "num_bins": 2,
    "base_num_channels": 32,
    "kernel_size": 3,
    "encoding": "cnt",
    "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
}


def _setup(B=2, H=16, W=16):
    model = build_model(CFG)
    rng = np.random.default_rng(0)
    cnt = rng.poisson(0.3, (B, H, W, 2)).astype(np.float32)
    states = model.init_states(B, H, W)
    variables = model.init(jax.random.PRNGKey(0), None, jnp.asarray(cnt), states)

    def step(variables, window, states):
        out, new_states = model.apply(variables, None, window, states, train=False)
        return out["flow"][0], new_states

    return model, variables, cnt, states, step


def test_param_shardings_channel_axis():
    mesh = make_mesh_tp(1, 8)
    _, variables, _, _, _ = _setup()
    specs = param_shardings(variables, mesh)
    kern = specs["params"]["head"]["ff"]["kernel"].spec
    assert kern == P(None, None, None, "model")  # [3,3,Cin,Cout] -> Cout sharded
    pred = specs["params"]["pred"]["conv2d"]["kernel"].spec
    assert pred == P()  # Cout=2 is under the 2*nm width floor -> replicated


def test_state_shardings_batch_and_channel():
    mesh = make_mesh_tp(2, 4)
    model, _, _, states, _ = _setup(B=2)
    placed = shard_channel_tree(states, mesh)
    leaf = jax.tree.leaves(placed)[0]
    assert leaf.sharding.spec == P("data", None, None, "model")


@pytest.mark.parametrize("data,model_ax", [(1, 8), (2, 4)])
def test_tp_forward_matches_replicated(data, model_ax):
    """Channel-sharded forward == unsharded forward, state carried 3 steps."""
    _, variables, cnt, states, step = _setup(B=2)
    ref = jax.jit(step)
    mesh = make_mesh_tp(data, model_ax)
    tp = tp_jit_step(step, mesh)

    st_ref, st_tp = states, shard_channel_tree(states, mesh)
    for k in range(3):
        w = cnt * (1.0 + 0.25 * k)
        flow_ref, st_ref = ref(variables, w, st_ref)
        flow_tp, st_tp = tp(variables, w, st_tp)
        # f32 collective reassociation: ~1e-4 relative on membrane carries
        np.testing.assert_allclose(
            np.asarray(flow_tp), np.asarray(flow_ref), rtol=2e-4, atol=1e-5
        )
    for a, b in zip(jax.tree.leaves(st_tp), jax.tree.leaves(st_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        )


def test_tp_grads_match_replicated():
    """Parameter gradients under TP sharding == unsharded gradients."""
    model, variables, cnt, states, _ = _setup(B=2)
    rest = {k: v for k, v in variables.items() if k != "params"}

    def gstep(variables, window, states):
        def loss(p):
            out, _ = model.apply(
                {**rest, "params": p}, None, window, states, train=False
            )
            return out["flow"][0].sum()

        return jax.grad(loss)(variables["params"]), states

    ref_grads, _ = jax.jit(gstep)(variables, cnt, states)
    mesh = make_mesh_tp(2, 4)
    tp = tp_jit_step(gstep, mesh)
    tp_grads, _ = tp(variables, cnt, shard_channel_tree(states, mesh))

    flat_ref = jax.tree.leaves(ref_grads)
    flat_tp = jax.tree.leaves(tp_grads)
    assert len(flat_ref) == len(flat_tp)
    for a, b in zip(flat_tp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_tp_int8_engine_states_exact():
    """The int8 deploy engine under TP: spike/membrane carries bit-exact
    (integer dataflow shards without reassociation), flow within f32
    psum noise of the unsharded engine."""
    from evflow.deploy import Int8DeployEngine

    model, variables, cnt, states, _ = _setup(B=2)
    eng = Int8DeployEngine(model, variables, mem_dtype="bfloat16")
    est = eng.init_states(2, 16, 16)

    def step(params, window, st):
        out, new_st = eng.apply(params, None, window, st)
        return out["flow"][0], new_st

    flow_ref, st_ref = jax.jit(step)(eng.params, cnt, est)
    mesh = make_mesh_tp(2, 4)
    tp = tp_jit_step(step, mesh)
    flow_tp, st_tp = tp(eng.params, cnt, shard_channel_tree(est, mesh))

    np.testing.assert_allclose(
        np.asarray(flow_tp), np.asarray(flow_ref), rtol=1e-3, atol=1e-3
    )
    for a, b in zip(jax.tree.leaves(st_tp), jax.tree.leaves(st_ref)):
        assert np.array_equal(
            np.asarray(a).astype(np.float32), np.asarray(b).astype(np.float32)
        ), "TP engine state carries must be bit-exact"


def test_tp_unet_phase_engine_bit_exact():
    """The UNet phase engine under TP: flows AND carries bit-exact.

    (SPMD logs 'involuntary full rematerialization' warnings on the
    phase-interleave transposes at model-axis size 4 (measured cell:
    ROOFLINE §4, benchmarks/probe_tp_phase_cost.py — sizes 2 and 8
    compile clean) — any resharding is semantics-preserving; TP on the
    phase tier is a correctness capability, not a perf recommendation.)"""
    from evflow.deploy_unet import Int8UNetEngine

    cfg = dict(CFG, name="SpikingRecEVFlowNet")
    model = build_model(cfg)
    B, H, W = 1, 32, 32
    states = model.init_states(B, H, W)
    variables = model.init(
        jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states
    )
    eng = Int8UNetEngine(model, variables, compute="hybrid", phase_decoders=True)
    est = eng.init_states(B, H, W)
    rng = np.random.default_rng(0)
    win = rng.poisson(0.3, (B, H, W, 2)).astype(np.float32)

    def step(params, window, st):
        out, new_st = eng.apply(params, None, window, st)
        return out["flow"][-1], new_st

    flow_ref, st_ref = jax.jit(step)(eng.params, win, est)
    # the raw (guard-off) API: this test PURPOSELY compiles the
    # measured-bad model-axis-4 cell to pin that the reshards are
    # semantics-preserving; the public engine path refuses it
    # (test_tp_phase_guard below)
    mesh = make_mesh_tp(1, 4)
    tp = tp_jit_step(step, mesh)
    flow_tp, st_tp = tp(eng.params, win, shard_channel_tree(est, mesh))

    assert np.array_equal(np.asarray(flow_tp), np.asarray(flow_ref))
    for a, b in zip(jax.tree.leaves(st_tp), jax.tree.leaves(st_ref)):
        assert np.array_equal(
            np.asarray(a).astype(np.float32), np.asarray(b).astype(np.float32)
        )


def test_tp_phase_guard():
    """The measured-bad TP x phase configuration (model axis 4 with phase
    decoders — 3 involuntary-full-remat reshards/step,
    benchmarks/probe_tp_phase_cost.py) is REFUSED by every public entry:
    make_mesh_tp(phase_decoders=True), tp_jit_step(phase_decoders=True),
    and Int8UNetEngine.tp_jit_step; sizes 2 and 8 pass, and non-phase
    engines are unaffected (round-5 verdict item 4)."""
    from evflow.deploy_unet import Int8UNetEngine

    # mesh construction refuses model=4 only when phase_decoders is set
    with pytest.raises(ValueError, match="phase"):
        make_mesh_tp(2, 4, phase_decoders=True)
    with pytest.raises(ValueError, match="phase"):
        make_mesh_tp(1, 4, phase_decoders=True)
    assert make_mesh_tp(2, 4).shape["model"] == 4  # guard off by default
    assert make_mesh_tp(4, 2, phase_decoders=True).shape["model"] == 2
    assert make_mesh_tp(1, 8, phase_decoders=True).shape["model"] == 8

    # tp_jit_step refuses at wrap time (before any compile)
    mesh4 = make_mesh_tp(1, 4)
    with pytest.raises(ValueError, match="phase"):
        tp_jit_step(lambda v, w, s: (w, s), mesh4, phase_decoders=True)
    assert tp_jit_step(lambda v, w, s: (w, s), mesh4) is not None

    # the engine hook forwards its own flag
    cfg = dict(CFG, name="SpikingRecEVFlowNet")
    model = build_model(cfg)
    B, H, W = 1, 32, 32
    states = model.init_states(B, H, W)
    variables = model.init(
        jax.random.PRNGKey(0), None, jnp.zeros((B, H, W, 2)), states
    )
    eng_phase = Int8UNetEngine(
        model, variables, compute="hybrid", phase_decoders=True
    )
    with pytest.raises(ValueError, match="phase"):
        eng_phase.tp_jit_step(mesh4)
    assert eng_phase.tp_jit_step(make_mesh_tp(1, 2)) is not None

    eng_plain = Int8UNetEngine(
        model, variables, compute="hybrid", phase_decoders=False
    )
    step = eng_plain.tp_jit_step(mesh4)  # non-phase engine: model=4 is fine
    est = eng_plain.init_states(B, H, W)
    win = np.random.default_rng(0).poisson(0.3, (B, H, W, 2)).astype(np.float32)
    flows, _ = step(eng_plain.params, win, shard_channel_tree(est, mesh4))
    assert np.isfinite(np.asarray(flows[-1])).all()


def test_tp_full_train_step_matches_replicated():
    """The FULL TBPTT train step (forward scan + warp loss + backward +
    Adam) under TP param/state sharding: loss and gradients match the
    replicated step. GSPMD propagates the channel sharding through the
    scan, the event gather/scatter (event tensors replicate — coordinate
    leaves are excluded from channel sharding by the rank/width floor in
    _leaf_act_spec), and the optimizer."""
    import optax

    from evflow.loss.warp_loss import EventWarpingConfig
    from evflow.registry import build_optimizer
    from evflow.train import make_train_step, stack_window

    cfg = dict(CFG, base_num_channels=8)
    model = build_model(cfg)
    B, H, W, Pn, N = 2, 16, 16, 2, 32
    states = model.init_states(B, H, W)
    cnt0 = jnp.zeros((B, H, W, 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), None, cnt0, states)

    tx = optax.chain(
        optax.clip_by_global_norm(1.0), build_optimizer({"name": "Adam", "lr": 2e-4})
    )
    warp_cfg = EventWarpingConfig(
        {
            "loader": {"resolution": [H, W]},
            "loss": {"flow_regul_weight": 0.001},
            "model": {"mask_output": True},
        }
    )
    step_fn = make_train_step(model, tx, warp_cfg)

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(Pn):
        ys = rng.integers(0, H, (B, N)).astype(np.float32)
        xs = rng.integers(0, W, (B, N)).astype(np.float32)
        ts = np.sort(rng.uniform(0, 1, (B, N)), axis=1).astype(np.float32)
        ps = rng.choice([-1.0, 1.0], (B, N)).astype(np.float32)
        c = rng.poisson(0.1, (B, H, W, 2)).astype(np.float32)
        batches.append(
            {
                "event_list": np.stack([ts, ys, xs, ps], -1),
                "event_list_pol_mask": np.stack(
                    [(ps > 0).astype(np.float32), (ps < 0).astype(np.float32)], -1
                ),
                "event_valid": np.ones((B, N), np.float32),
                "event_cnt": c,
                "event_voxel": c.copy(),
                "event_mask": (c.sum(-1, keepdims=True) > 0).astype(np.float32),
            }
        )
    window = stack_window(batches)

    # the jitted step donates args 0-3 — rebuild fresh device buffers from
    # host snapshots for each invocation
    variables_np = jax.device_get(variables)
    states_np = jax.device_get(states)

    def fresh():
        v = jax.tree.map(jnp.asarray, variables_np)
        return (
            v["params"],
            v.get("batch_stats", {}),
            tx.init(v["params"]),
            jax.tree.map(jnp.asarray, states_np),
            jax.tree.map(np.asarray, window),
        )

    p, bs, opt, st, w = fresh()
    loss_ref, _, _, _, _, grads_ref = step_fn(p, bs, opt, st, w)
    grads_ref = jax.device_get(grads_ref)
    loss_ref = float(loss_ref)

    mesh = make_mesh_tp(1, 4)
    p, bs, opt, st, w = fresh()
    put = lambda tree, specs: jax.tree.map(jax.device_put, tree, specs)
    p = put(p, param_shardings(p, mesh))
    bs = put(bs, param_shardings(bs, mesh))
    opt = put(opt, param_shardings(opt, mesh))
    st = shard_channel_tree(st, mesh)
    loss_tp, _, _, _, _, grads_tp = step_fn(p, bs, opt, st, w)

    assert abs(float(loss_tp) - loss_ref) < 1e-5 * max(1.0, abs(loss_ref))
    for a, b in zip(jax.tree.leaves(grads_tp), jax.tree.leaves(grads_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_channel_shardings_replicate_indivisible():
    mesh = make_mesh_tp(1, 8)
    specs = channel_shardings({"x": np.zeros((2, 8, 8, 2))}, mesh)
    # num_bins=2 channels don't divide the 8-way model axis -> batch-only
    assert specs["x"].spec == P(None, None, None, None)
