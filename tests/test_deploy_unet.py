"""Int8 UNet deployment engine (evflow/deploy_unet.py): exactness + AEE parity.

The UNet engine extends the real-int8 serving path to SpikingRecEVFlowNet
(the reference deploys only FireNet — Model_export_RealQuant.py). Tests:

1. the engine's integer arithmetic matches the fake-quant f32 twin
   (quantize_unet_weights) — every quantization point except the 1/127
   prediction-feedback grid is exact, so flows must agree to f32 rounding;
2. full gtflow-protocol AEE parity vs f32 through evaluate() on a trained
   model (per-channel weight-PTQ budget, reference eval_flow_quant.py);
3. artifact roundtrip is bit-exact; unsupported configs are rejected.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evflow.config import combine_entries
from evflow.deploy_unet import (Int8UNetEngine, quantize_unet_weights,
                                save_unet_engine)
from evflow.eval import evaluate
from evflow.registry import build_model
from evflow.train import train

h5py = pytest.importorskip("h5py")

RES = 32


def _model_cfg(**over):
    cfg = {
        "name": "SpikingRecEVFlowNet",
        "encoding": "cnt",
        "round_encoding": False,
        "norm_input": False,
        "num_bins": 2,
        "base_num_channels": 4,
        "kernel_size": 3,
        "mask_output": True,
        "spiking_neuron": {
            "leak": [-4.0, 0.1],
            "thresh": [0.8, 0.0],
            "learn_leak": True,
            "learn_thresh": True,
            "hard_reset": True,
        },
    }
    cfg.update(over)
    return cfg


def _init(model, B=2, H=RES, W=RES):
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(3), None,
                   jnp.zeros((B, H, W, 2)), states)
    return v, states


@pytest.mark.parametrize("compute", ["int8", "bfloat16", "hybrid", "hybrid8"])
def test_unet_engine_matches_fake_quant_model(compute):
    """With the engine's own dequantized-int8 kernels installed in the flax
    model, the f32 membrane tier must reproduce its flows at f32 rounding:
    spikes, residual sums, and the 1/16 decoder grid are exact integer
    surfaces; only the 2-channel 1/127 prediction feedback is lossy (and
    the fake-quant twin feeds the unquantized prediction, bounding the
    divergence by that grid). Both compute tiers carry the same integer
    arithmetic (bf16 holds int8 values exactly; f32 accumulates integer
    products exactly below 2^24)."""
    model = build_model(_model_cfg())
    B = 2
    v, states = _init(model, B)
    vq = {"params": quantize_unet_weights(model, v["params"])}
    engine = Int8UNetEngine(model, v, mem_dtype="float32", compute=compute)

    key = jax.random.PRNGKey(0)
    est = engine.init_states(B, RES, RES)
    for t in range(6):
        key, k = jax.random.split(key)
        cnt = jax.random.poisson(k, 0.4, (B, RES, RES, 2)).astype(jnp.float32)
        outf, states = model.apply(vq, None, cnt, states, train=False)
        oute, est = engine.apply(engine.params, None, cnt, est, train=False)
        for a, b in zip(outf["flow"], oute["flow"]):
            d = np.abs(np.asarray(a) - np.asarray(b))
            assert (d < 0.02).mean() > 0.995, f"step {t}: agreement {(d < 0.02).mean()}"
        if t == 0:
            # no accumulated state yet: the first window must agree tightly
            for a, b in zip(outf["flow"], oute["flow"]):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-4)


def test_unet_engine_hybrid_dypack_path():
    """The hybrid tier's dy-pack branch (stride-1 convs at >=
    dypack_min_spatial ride the s8 cols GEMM) computes the same conv:
    lowering the crossover to cover every layer at toy size must keep the
    flows in agreement with the uniform bf16 tier (the dy-pack Z rides
    bf16, so agreement is at bf16 rounding, not bit-exact)."""
    model = build_model(_model_cfg())
    B = 1
    v, _ = _init(model, B)
    ebf = Int8UNetEngine(model, v, mem_dtype="float32", compute="bfloat16")
    ehy = Int8UNetEngine(model, v, mem_dtype="float32", compute="hybrid")
    ehy.dypack_min_spatial = 2  # exercise the GEMM branch on every layer
    sb, sh = ebf.init_states(B, RES, RES), ehy.init_states(B, RES, RES)
    key = jax.random.PRNGKey(5)
    for t in range(4):
        key, k = jax.random.split(key)
        cnt = jax.random.poisson(k, 0.4, (B, RES, RES, 2)).astype(jnp.float32)
        ob, sb = ebf.apply(ebf.params, None, cnt, sb)
        oh, sh = ehy.apply(ehy.params, None, cnt, sh)
        for a, b in zip(ob["flow"], oh["flow"]):
            d = np.abs(np.asarray(a) - np.asarray(b))
            assert (d < 0.02).mean() > 0.99, f"step {t}: {(d < 0.02).mean()}"


def test_unet_engine_phase_decoders_match_interior(tmp_path):
    """Phase-decomposed decoders (bilinear x2 folded into 4 low-res
    kernels) reproduce the resize-path engine away from the documented
    1-2 px border frame, and the flag survives the artifact roundtrip
    (phase kernels re-derive deterministically from the canonical int8
    weights)."""
    from evflow.deploy_unet import save_unet_engine

    model = build_model(_model_cfg())
    B = 1
    v, _ = _init(model, B)
    e_rs = Int8UNetEngine(model, v, mem_dtype="float32")
    e_ph = Int8UNetEngine(model, v, mem_dtype="float32",
                          phase_decoders=True)
    s_rs, s_ph = e_rs.init_states(B, RES, RES), e_ph.init_states(B, RES, RES)
    key = jax.random.PRNGKey(9)
    for t in range(4):
        key, k = jax.random.split(key)
        cnt = jax.random.poisson(k, 0.4, (B, RES, RES, 2)).astype(jnp.float32)
        o_rs, s_rs = e_rs.apply(e_rs.params, None, cnt, s_rs)
        o_ph, s_ph = e_ph.apply(e_ph.params, None, cnt, s_ph)
        for a, b in zip(o_rs["flow"], o_ph["flow"]):
            d = np.abs(np.asarray(a) - np.asarray(b))[:, 8:-8, 8:-8]
            assert (d < 0.02).mean() > 0.99, f"step {t}: {(d < 0.02).mean()}"

    path = save_unet_engine(e_ph, str(tmp_path / "phase_engine"))
    e2 = Int8UNetEngine.from_artifact(model, path)
    assert e2.phase_decoders
    cnt = jax.random.poisson(jax.random.PRNGKey(2), 0.4,
                             (B, RES, RES, 2)).astype(jnp.float32)
    o1, _ = e_ph.apply(e_ph.params, None, cnt, e_ph.init_states(B, RES, RES))
    o2, _ = e2.apply(e2.params, None, cnt, e2.init_states(B, RES, RES))
    for a, b in zip(o1["flow"], o2["flow"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unet_engine_phase_decoders_slot_independent():
    """B=2 phase engine == two independent B=1 runs, bit-for-bit.

    The phase step keeps decoder activations and LIF state phase-STACKED
    on the channel axis and interleaves via reshape/transpose — exactly
    where a wrong axis order would mix batch slots. Integer GEMMs are
    order-exact and the elementwise membrane path is per-element, so the
    slots must match their solo runs exactly."""
    model = build_model(_model_cfg())
    v, _ = _init(model, 2)
    eng = Int8UNetEngine(model, v, mem_dtype="float32", phase_decoders=True)

    key = jax.random.PRNGKey(11)
    ka, kb = jax.random.split(key)
    seq_a = [jax.random.poisson(k, 0.4, (1, RES, RES, 2)).astype(jnp.float32)
             for k in jax.random.split(ka, 3)]
    seq_b = [jax.random.poisson(k, 0.7, (1, RES, RES, 2)).astype(jnp.float32)
             for k in jax.random.split(kb, 3)]

    s2 = eng.init_states(2, RES, RES)
    sa = eng.init_states(1, RES, RES)
    sb = eng.init_states(1, RES, RES)
    for cnt_a, cnt_b in zip(seq_a, seq_b):
        o2, s2 = eng.apply(eng.params, None,
                           jnp.concatenate([cnt_a, cnt_b], axis=0), s2)
        oa, sa = eng.apply(eng.params, None, cnt_a, sa)
        ob, sb = eng.apply(eng.params, None, cnt_b, sb)
        for f2, f1 in zip(o2["flow"], oa["flow"]):
            np.testing.assert_array_equal(np.asarray(f2)[0:1], np.asarray(f1))
        for f2, f1 in zip(o2["flow"], ob["flow"]):
            np.testing.assert_array_equal(np.asarray(f2)[1:2], np.asarray(f1))


def test_unet_engine_bf16_membranes_close():
    """The serving tier (bf16 membranes) tracks the f32-membrane engine."""
    model = build_model(_model_cfg())
    B = 1
    v, _ = _init(model, B)
    e32 = Int8UNetEngine(model, v, mem_dtype="float32")
    e16 = Int8UNetEngine(model, v, mem_dtype="bfloat16")
    s32, s16 = e32.init_states(B, RES, RES), e16.init_states(B, RES, RES)
    key = jax.random.PRNGKey(7)
    for _ in range(5):
        key, k = jax.random.split(key)
        cnt = jax.random.poisson(k, 0.4, (B, RES, RES, 2)).astype(jnp.float32)
        o32, s32 = e32.apply(e32.params, None, cnt, s32)
        o16, s16 = e16.apply(e16.params, None, cnt, s16)
        d = np.abs(np.asarray(o32["flow"][-1]) - np.asarray(o16["flow"][-1]))
        assert (d < 0.05).mean() > 0.99


def test_unet_engine_rejects_unsupported():
    model = build_model(_model_cfg())
    v, _ = _init(model, 1)
    fire = build_model({**_model_cfg(), "name": "LIFFireNet_short",
                        "base_num_channels": 8})
    vf = fire.init(jax.random.PRNGKey(0), None, jnp.zeros((1, RES, RES, 2)),
                   fire.init_states(1, RES, RES))
    with pytest.raises(ValueError, match="FireNet"):
        Int8UNetEngine(fire, vf)
    with pytest.raises(ValueError, match="norm_input"):
        Int8UNetEngine(build_model(_model_cfg(norm_input=True)), v)
    with pytest.raises(ValueError, match="input_scale"):
        Int8UNetEngine(
            build_model(_model_cfg(encoding="voxel", num_bins=2)), v
        )
    with pytest.raises(ValueError, match="mem_dtype"):
        Int8UNetEngine(model, v, mem_dtype="int8")
    with pytest.raises(ValueError, match="residual blocks"):
        deep = build_model(_model_cfg())
        object.__setattr__(deep, "num_residual_blocks", 7)
        Int8UNetEngine(deep, v)


def test_unet_engine_artifact_roundtrip(tmp_path):
    """save_unet_engine -> from_artifact reproduces the engine bit-for-bit
    (the deployment handoff: serving hosts never see the f32 checkpoint)."""
    model = build_model(_model_cfg())
    B = 1
    v, _ = _init(model, B)
    e1 = Int8UNetEngine(model, v)
    path = save_unet_engine(e1, str(tmp_path / "unet_engine"))
    e2 = Int8UNetEngine.from_artifact(model, path)

    f1 = jax.tree_util.tree_flatten_with_path(e1.params)[0]
    f2 = jax.tree_util.tree_flatten_with_path(e2.params)[0]
    assert len(f1) == len(f2)
    for (k1, a), (k2, b) in zip(f1, f2):
        assert k1 == k2
        assert a.dtype == b.dtype, k1
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))

    cnt = jax.random.poisson(jax.random.PRNGKey(1), 0.4,
                             (B, RES, RES, 2)).astype(jnp.float32)
    o1, _ = e1.apply(e1.params, None, cnt, e1.init_states(B, RES, RES))
    o2, _ = e2.apply(e2.params, None, cnt, e2.init_states(B, RES, RES))
    for a, b in zip(o1["flow"], o2["flow"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # structural mismatch is rejected (wrong model for the artifact)
    small = build_model(_model_cfg())
    object.__setattr__(small, "num_encoders", 3)
    with pytest.raises(ValueError, match="encoder"):
        Int8UNetEngine.from_artifact(small, path)


def test_unet_autotune_and_serving_carry(tmp_path):
    """autotune_serving measures the UNet engine's compute-tier grid
    (evflow/autotune.py dispatch) and the tuned ServingConfig rides the
    artifact through save_unet_engine/from_artifact like the FireNet
    engine's."""
    from evflow.autotune import ServingConfig, autotune_serving
    from evflow.deploy_unet import Int8UNetEngine, save_unet_engine

    model = build_model(_model_cfg())
    v, _ = _init(model, 1)
    cfg = autotune_serving(model, v, RES, RES,
                           tiers=("bfloat16", "int8", "hybrid+phase"),
                           batches=(1,), chunk=4, iters=1)
    assert cfg.mem_dtype in ("bfloat16", "int8", "hybrid+phase")
    assert set(cfg.table) == {"bfloat16/B1/T4", "int8/B1/T4",
                              "hybrid+phase/B1/T4"}
    assert cfg.windows_per_s > 0

    phase = cfg.mem_dtype.endswith("+phase")
    base = cfg.mem_dtype[:-6] if phase else cfg.mem_dtype
    engine = Int8UNetEngine(model, v, compute=base, phase_decoders=phase)
    engine.serving = cfg.to_meta()
    path = save_unet_engine(engine, str(tmp_path / "tuned_unet"))
    e2 = Int8UNetEngine.from_artifact(model, path)
    assert e2.compute == base and e2.phase_decoders == phase
    assert e2.serving == cfg.to_meta()
    assert ServingConfig.from_meta(e2.serving).chunk == cfg.chunk

    with pytest.raises(ValueError, match="compute tiers"):
        autotune_serving(model, v, RES, RES, tiers=("mixed",),
                         batches=(1,), chunk=2, iters=1)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from evflow.data.synthetic import make_dataset
    from evflow.utils.checkpoint import load_checkpoint

    root = str(tmp_path_factory.mktemp("unet_deploy"))
    make_dataset(root, num_sequences=2, resolution=(RES, RES),
                 events_per_sec=40_000, duration=1.0,
                 flows=[(8.0, -4.0), (-6.0, 5.0)], gt_hz=10.0)
    train_root = os.path.join(root, "t")
    os.makedirs(train_root)
    make_dataset(train_root, num_sequences=2, resolution=(RES, RES),
                 events_per_sec=40_000, duration=1.0,
                 flows=[(8.0, -4.0), (-6.0, 5.0)], gt_hz=10.0)
    tcfg = combine_entries({
        "experiment": "unet_deploy_parity",
        "data": {"path": train_root, "mode": "events", "window": 500,
                 "window_loss": 2500},
        "model": _model_cfg(),
        "loss": {"flow_regul_weight": 0.001, "clip_grad": 1.0},
        "optimizer": {"name": "Adam", "lr": 0.002},
        "loader": {"n_epochs": 10000, "batch_size": 2,
                   "resolution": [RES, RES], "std_resolution": [RES, RES],
                   "augment": [], "seed": 0},
        "vis": {"verbose": False, "store_grads": False, "bars": False},
        "hot_filter": {"enabled": False},
    })
    run = train(tcfg, path_runs=os.path.join(train_root, "runs"),
                max_steps=60, verbose=False)
    ck = glob.glob(os.path.join(run.dir, "checkpoints", "most_recent", "*"))[0]

    model = build_model(_model_cfg())
    v0, _ = _init(model, 1)
    restored = load_checkpoint(ck, {
        "params": v0["params"], "batch_stats": v0.get("batch_stats", {}),
        "opt_state": None, "epoch": 0, "loss": 0.0, "loss_variance": 0.0,
    })
    return root, {"params": restored["params"],
                  "batch_stats": restored["batch_stats"]}


def test_unet_engine_aee_parity(trained):
    """Full gtflow protocol through evaluate(): the UNet engine must hold
    AEE within 2% of the f32 model — the per-channel weight-PTQ budget
    plus the 1/127 prediction-feedback grid."""
    root, variables = trained
    model = build_model(_model_cfg())
    cfg = combine_entries({
        "experiment": "unet_deploy_parity",
        "data": {"path": root, "mode": "gtflow_dt1", "window": 1},
        "model": _model_cfg(),
        "metrics": {"name": ["AEE"], "flow_scaling": RES, "heat_map": False},
        "loader": {"batch_size": 1, "resolution": [RES, RES],
                   "std_resolution": [RES, RES], "augment": [], "seed": 0},
        "vis": {"verbose": False, "enabled": False, "bars": False},
        "hot_filter": {"enabled": False},
    })

    def aee(res):
        return float(np.mean([float(x) for x in res["AEE"].values()]))

    aee_f32 = aee(evaluate(cfg, path_results=os.path.join(root, "r", "f32"),
                           debug=True, model=model, variables=variables,
                           max_windows=120, verbose=False))
    engine = Int8UNetEngine(model, variables)
    aee_i8 = aee(evaluate(cfg, path_results=os.path.join(root, "r", "i8"),
                          debug=True, model=engine, variables=engine.params,
                          max_windows=120, verbose=False))
    assert aee_f32 > 0.05
    rel = abs(aee_i8 - aee_f32) / aee_f32
    assert rel < 0.02, (
        f"UNet int8 engine AEE diverged: {aee_i8:.4f} vs {aee_f32:.4f} "
        f"({100 * rel:.2f}%)"
    )

    # chunked dispatch (K windows per device call) preserves the metrics
    # for the multires engine exactly as for FireNet
    aee_chunk = aee(evaluate(cfg, path_results=os.path.join(root, "r", "ic"),
                             debug=True, model=engine,
                             variables=engine.params, max_windows=120,
                             chunk=3, verbose=False))
    np.testing.assert_allclose(aee_chunk, aee_i8, rtol=1e-5)

    # the hybrid tier (dy-pack routing, bf16 Z) holds the same AEE budget
    ehy = Int8UNetEngine(model, variables, compute="hybrid")
    ehy.dypack_min_spatial = 2  # exercise the GEMM branch at toy size
    aee_hy = aee(evaluate(cfg, path_results=os.path.join(root, "r", "hy"),
                          debug=True, model=ehy, variables=ehy.params,
                          max_windows=120, verbose=False))
    assert abs(aee_hy - aee_f32) / aee_f32 < 0.02, (
        f"hybrid tier AEE diverged: {aee_hy:.4f} vs {aee_f32:.4f}")

    # phase-decomposed decoders (border-frame divergence + per-phase
    # weight grids) must also hold the budget — at this toy 32² scale the
    # border frame is a far LARGER fraction of pixels than in deployment,
    # so this is the conservative check
    eph = Int8UNetEngine(model, variables, compute="hybrid",
                         phase_decoders=True)
    eph.dypack_min_spatial = 2
    aee_ph = aee(evaluate(cfg, path_results=os.path.join(root, "r", "ph"),
                          debug=True, model=eph, variables=eph.params,
                          max_windows=120, verbose=False))
    assert abs(aee_ph - aee_f32) / aee_f32 < 0.05, (
        f"phase-decoder AEE diverged: {aee_ph:.4f} vs {aee_f32:.4f}")
