"""Int8 deployment engine (evflow/deploy.py): wiring exactness + AEE parity.

The engine is the serving analog of the reference's PTQ deployment
(eval_flow_quant.py PTQ full / conv-only modes): folded BN, per-channel
int8 weights, int8 spike carries, optional int8 membranes. Tests:

1. grid-snapped weights -> the int8 GEMM is exact integer math, so the
   engine must match the f32 flax model to bf16 rounding (catches any
   layout / scale / recurrent-routing bug deterministically);
2. full gtflow-protocol AEE parity vs f32 on a trained model (weight-PTQ
   error budget), for both bf16 and int8 membrane carries.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evflow.config import combine_entries
from evflow.deploy import Int8DeployEngine
from evflow.eval import evaluate
from evflow.registry import build_model
from evflow.train import train
from evflow.utils.checkpoint import load_checkpoint

h5py = pytest.importorskip("h5py")

RES = 64


def _model_cfg(**over):
    cfg = {
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
    }
    cfg.update(over)
    return cfg


def _snap_kernels_to_int8_grid(variables):
    """Replace every conv kernel by its per-output-channel int8 quantization
    (round(k/s)*s), so the engine's weight quantization is lossless.
    Recurrent units share one scale across ff+rec, exactly as
    prepare_int8_params does for the dual GEMM."""

    def snap_one(k, s):
        return jnp.asarray(np.clip(np.round(np.asarray(k, np.float32) / s), -127, 127) * s)

    params = jax.tree.map(lambda x: x, variables)  # deep-ish copy of the dict tree
    for name, unit in params["params"].items():
        if not isinstance(unit, dict) or "ff" not in unit:
            if isinstance(unit, dict) and "conv2d" in unit:  # pred head
                k = np.asarray(unit["conv2d"]["kernel"], np.float32)
                s = np.maximum(np.max(np.abs(k), axis=(0, 1, 2)), 1e-12) / 127.0
                unit["conv2d"]["kernel"] = snap_one(k, s)
            continue
        kf = np.asarray(unit["ff"]["kernel"], np.float32)
        if "rec" in unit:
            kr = np.asarray(unit["rec"]["kernel"], np.float32)
            s = np.maximum(
                np.maximum(np.max(np.abs(kf), axis=(0, 1, 2)),
                           np.max(np.abs(kr), axis=(0, 1, 2))), 1e-12
            ) / 127.0
            unit["ff"]["kernel"] = snap_one(kf, s)
            unit["rec"]["kernel"] = snap_one(kr, s)
        else:
            s = np.maximum(np.max(np.abs(kf), axis=(0, 1, 2)), 1e-12) / 127.0
            unit["ff"]["kernel"] = snap_one(kf, s)
    return params


def test_engine_matches_f32_on_grid_weights():
    """With kernels already on the int8 grid and integer count inputs, the
    engine differs from the f32 model only by bf16 rounding."""
    model = build_model(_model_cfg())
    B, H, W = 2, 16, 16
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(3), None, jnp.zeros((B, H, W, 2)), states)
    v = _snap_kernels_to_int8_grid(v)
    # shared per-channel scales for the recurrent units' dual GEMM: snap
    # ff+rec together the way prepare_int8_params does
    engine = Int8DeployEngine(model, v)

    key = jax.random.PRNGKey(0)
    est = engine.init_states(B, H, W)
    agree = []
    for t in range(6):
        key, k = jax.random.split(key)
        cnt = jax.random.poisson(k, 0.3, (B, H, W, 2)).astype(jnp.float32)
        outf, states = model.apply(v, None, cnt, states, train=False)
        oute, est = engine.apply(engine.params, None, cnt, est, train=False)
        f32 = np.asarray(outf["flow"][0])
        i8 = np.asarray(oute["flow"][0])
        # spikes feeding pred can flip when a membrane sits exactly at the
        # bf16 rounding edge; require near-total agreement of the flow field
        agree.append(np.mean(np.abs(f32 - i8) < 0.02))
    assert np.mean(agree) > 0.995, f"flow agreement too low: {np.mean(agree)}"


def test_engine_rejects_unsupported_configs():
    model = build_model(_model_cfg(norm_input=True))
    v_shape = model.init_states(1, 8, 8)
    with pytest.raises(ValueError, match="norm_input"):
        Int8DeployEngine(model, {"params": {}})
    del v_shape


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from evflow.data.synthetic import make_dataset

    base = tmp_path_factory.mktemp("deploy_parity")
    train_root = str(base / "train")
    root = str(base / "eval")
    make_dataset(
        train_root,
        num_sequences=2,
        resolution=(RES, RES),
        events_per_sec=120_000,
        duration=1.0,
        flows=[(12.0, -8.0), (-10.0, 6.0)],
        gt_hz=10.0,
    )
    make_dataset(
        root,
        num_sequences=1,
        resolution=(RES, RES),
        events_per_sec=120_000,
        duration=3.0,
        flows=[(12.0, -8.0)],
        gt_hz=60.0,
    )
    tcfg = combine_entries(
        {
            "experiment": "deploy_parity",
            "data": {"path": train_root, "mode": "events", "window": 500, "window_loss": 2500},
            "model": _model_cfg(),
            "loss": {"flow_regul_weight": 0.001, "clip_grad": 1.0},
            "optimizer": {"name": "Adam", "lr": 0.002},
            "loader": {
                "n_epochs": 10000,
                "batch_size": 2,
                "resolution": [RES, RES],
                "std_resolution": [RES, RES],
                "augment": [],
                "seed": 0,
            },
            "vis": {"verbose": False, "store_grads": False, "bars": False},
            "hot_filter": {"enabled": False},
        }
    )
    run = train(tcfg, path_runs=os.path.join(train_root, "runs"), max_steps=80, verbose=False)
    ck = glob.glob(os.path.join(run.dir, "checkpoints", "most_recent", "*"))[0]

    model = build_model(_model_cfg())
    st = model.init_states(1, RES, RES)
    v0 = model.init(jax.random.PRNGKey(0), None, jnp.zeros((1, RES, RES, 2)), st)
    tmpl = {
        "params": v0["params"],
        "batch_stats": v0.get("batch_stats", {}),
        "opt_state": None,
        "epoch": 0,
        "loss": 0.0,
        "loss_variance": 0.0,
    }
    restored = load_checkpoint(ck, tmpl)
    variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}
    return root, variables


def _ecfg(root):
    return combine_entries(
        {
            "experiment": "deploy_parity",
            "data": {"path": root, "mode": "gtflow_dt1", "window": 1},
            "model": _model_cfg(),
            "metrics": {"name": ["AEE"], "flow_scaling": RES, "heat_map": False},
            "loader": {
                "batch_size": 1,
                "resolution": [RES, RES],
                "std_resolution": [RES, RES],
                "augment": [],
                "seed": 0,
            },
            "vis": {"verbose": False, "enabled": False, "bars": False},
            "hot_filter": {"enabled": False},
        }
    )


def _aee(res):
    return float(np.mean([float(x) for x in res["AEE"].values()]))


def test_engine_aee_parity(trained):
    """Full gtflow protocol through evaluate(): the engine (bf16 membranes)
    must hold AEE within 2% of f32 — the per-channel weight-PTQ budget
    (reference conv-only PTQ measures ~1%, eval_flow_quant.py)."""
    root, variables = trained
    model = build_model(_model_cfg())
    cfg = _ecfg(root)

    aee_f32 = _aee(
        evaluate(cfg, path_results=os.path.join(root, "r", "f32"), debug=True,
                 model=model, variables=variables, max_windows=160, verbose=False)
    )
    engine = Int8DeployEngine(model, variables)
    aee_i8 = _aee(
        evaluate(cfg, path_results=os.path.join(root, "r", "i8"), debug=True,
                 model=engine, variables=engine.params, max_windows=160,
                 verbose=False)
    )
    assert aee_f32 > 0.05
    rel = abs(aee_i8 - aee_f32) / aee_f32
    assert rel < 0.02, f"int8 engine AEE diverged: {aee_i8:.4f} vs {aee_f32:.4f} ({100*rel:.2f}%)"


def test_engine_int8_membranes_aee(trained):
    """int8 membrane carries with profiled per-layer scales stay within 5%
    AEE of f32 (the PTQ states budget, benchmarks/VALIDATION.md)."""
    root, variables = trained
    model = build_model(_model_cfg())
    cfg = _ecfg(root)

    aee_f32 = _aee(
        evaluate(cfg, path_results=os.path.join(root, "r", "f32b"), debug=True,
                 model=model, variables=variables, max_windows=120, verbose=False)
    )

    # profile per-channel membrane scales on the bf16 engine
    from evflow.deploy import profile_mem_ranges

    key = jax.random.PRNGKey(1)
    windows = []
    for _ in range(20):
        key, k = jax.random.split(key)
        windows.append(jax.random.poisson(k, 0.2, (1, RES, RES, 2)).astype(jnp.float32))
    ranges = profile_mem_ranges(model, variables, windows)

    engine = Int8DeployEngine(model, variables, mem_dtype="int8", mem_ranges=ranges)
    aee_q = _aee(
        evaluate(cfg, path_results=os.path.join(root, "r", "i8m"), debug=True,
                 model=engine, variables=engine.params, max_windows=120,
                 verbose=False)
    )
    rel = abs(aee_q - aee_f32) / aee_f32
    assert rel < 0.05, f"int8-membrane AEE diverged: {aee_q:.4f} vs {aee_f32:.4f} ({100*rel:.2f}%)"


def test_engine_mixed_membrane_aee(trained):
    """The 'mixed' tier (bf16 head membrane, int8 elsewhere) must hold AEE
    within 2% of f32 — the head unit is the sole source of the int8
    membrane penalty (benchmarks/deploy_aee_tiers.py --sweep: +0.12% for
    all-but-head int8 vs +1.2% for any combination including the head)."""
    root, variables = trained
    model = build_model(_model_cfg())
    cfg = _ecfg(root)

    aee_f32 = _aee(
        evaluate(cfg, path_results=os.path.join(root, "r", "f32m"), debug=True,
                 model=model, variables=variables, max_windows=120, verbose=False)
    )

    from evflow.deploy import profile_mem_ranges

    key = jax.random.PRNGKey(1)
    windows = []
    for _ in range(20):
        key, k = jax.random.split(key)
        windows.append(jax.random.poisson(k, 0.2, (1, RES, RES, 2)).astype(jnp.float32))
    ranges = profile_mem_ranges(model, variables, windows)

    engine = Int8DeployEngine(model, variables, mem_dtype="mixed", mem_ranges=ranges)
    assert engine.unit_mem_int8[0] is False and all(engine.unit_mem_int8[1:])
    aee_q = _aee(
        evaluate(cfg, path_results=os.path.join(root, "r", "mxm"), debug=True,
                 model=engine, variables=engine.params, max_windows=120,
                 verbose=False)
    )
    rel = abs(aee_q - aee_f32) / aee_f32
    assert rel < 0.02, f"mixed-membrane AEE diverged: {aee_q:.4f} vs {aee_f32:.4f} ({100*rel:.2f}%)"


def test_engine_z_int8_aee(trained):
    """Calibrated int8 requantization of the GEMM intermediate (the fastest
    serving tier) stays within 5% AEE of f32 on the gtflow protocol."""
    from evflow.data.h5_stream import H5EventStream

    root, variables = trained
    model = build_model(_model_cfg())
    cfg = _ecfg(root)

    aee_f32 = _aee(
        evaluate(cfg, path_results=os.path.join(root, "r", "f32z"), debug=True,
                 model=model, variables=variables, max_windows=120, verbose=False)
    )

    # calibration windows drawn from the eval stream, like the reference's
    # 50-batch brevitas calibration pass (eval_flow.py:31-47)
    data = H5EventStream(cfg, 2, False)
    windows = [data.next_batch()["event_cnt"] for _ in range(15)]

    engine = Int8DeployEngine(model, variables)
    engine.calibrate_z(windows)
    assert all("z_requant" in u for u in engine.params["units"])
    aee_z = _aee(
        evaluate(cfg, path_results=os.path.join(root, "r", "zi8"), debug=True,
                 model=engine, variables=engine.params, max_windows=120,
                 verbose=False)
    )
    rel = abs(aee_z - aee_f32) / aee_f32
    assert rel < 0.05, f"z-int8 AEE diverged: {aee_z:.4f} vs {aee_f32:.4f} ({100*rel:.2f}%)"


@pytest.mark.parametrize("name,recurrent", [
    ("LIFFireNet", True),         # full 7-unit, G1/G2 recurrent (dual GEMM)
    ("LIFFireFlowNet_short", False),  # feedforward variant: no dual GEMM
])
def test_engine_model_variants(name, recurrent):
    model = build_model(_model_cfg(name=name))
    B, H, W = 1, 16, 16
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(5), None, jnp.zeros((B, H, W, 2)), states)
    engine = Int8DeployEngine(model, v, mem_dtype="int8")
    assert any(engine.unit_recurrent) == recurrent
    est = engine.init_states(B, H, W)
    cnt = jnp.ones((B, H, W, 2), jnp.float32)
    out, est = jax.jit(lambda p, c, s: engine.apply(p, None, c, s))(
        engine.params, cnt, est
    )
    assert out["flow"][0].shape == (B, H, W, 2)
    assert np.isfinite(np.asarray(out["flow"][0])).all()
    assert est[0].mem.dtype == jnp.int8
    # FF units drop their (never-read) spike carries; recurrent units keep them
    assert est[0].spk is None
    if recurrent:
        assert est[1].spk.dtype == jnp.int8


def test_engine_mixed_membrane_tier():
    """Per-unit mem_dtype (the mixed tier): configured units carry int8
    membranes, the rest bf16; an all-bfloat16 list is identical to the
    plain bf16 engine."""
    model = build_model(_model_cfg())
    B, H, W = 1, 16, 16
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(5), None, jnp.zeros((B, H, W, 2)), states)
    n = model.num_units
    rec = {i for i, nm in enumerate(model.unit_names) if nm in ("G1", "G2")}
    dts = ["bfloat16" if i in rec else "int8" for i in range(n)]

    engine = Int8DeployEngine(model, v, mem_dtype=dts)
    assert engine.mem_dtype == "mixed"
    est = engine.init_states(B, H, W)
    for i in range(n):
        want = jnp.bfloat16 if i in rec else jnp.int8
        assert est[i].mem.dtype == want, (i, est[i].mem.dtype)
    cnt = jnp.ones((B, H, W, 2), jnp.float32)
    out, est2 = jax.jit(lambda p, c, s: engine.apply(p, None, c, s))(
        engine.params, cnt, est
    )
    assert np.isfinite(np.asarray(out["flow"][0])).all()
    for i in range(n):
        assert est2[i].mem.dtype == est[i].mem.dtype

    # an all-bf16 sequence is the plain bf16 engine
    e_seq = Int8DeployEngine(model, v, mem_dtype=["bfloat16"] * n)
    e_str = Int8DeployEngine(model, v)
    assert e_seq.mem_dtype == "bfloat16"
    o1, _ = e_seq.apply(e_seq.params, None, cnt, e_seq.init_states(B, H, W))
    o2, _ = e_str.apply(e_str.params, None, cnt, e_str.init_states(B, H, W))
    np.testing.assert_array_equal(np.asarray(o1["flow"][0]), np.asarray(o2["flow"][0]))

    with pytest.raises(ValueError, match="entries"):
        Int8DeployEngine(model, v, mem_dtype=["int8"] * (n + 1))


def test_engine_voxel_input_scale():
    """Voxel encodings are fractional; the engine quantizes the input with a
    calibrated scale folded into the head's dequant columns."""
    model = build_model(_model_cfg(encoding="voxel"))
    B, H, W = 1, 16, 16
    states = model.init_states(B, H, W)
    vox = jax.random.uniform(jax.random.PRNGKey(7), (B, H, W, 2)) * 0.5
    v = model.init(jax.random.PRNGKey(5), vox, None, states)
    s_in = float(jnp.max(jnp.abs(vox))) / 127.0
    engine = Int8DeployEngine(model, v, input_scale=s_in)
    est = engine.init_states(B, H, W)
    oute, _ = engine.apply(engine.params, vox, None, est)
    outf, _ = model.apply(v, vox, None, states, train=False)
    # input quantization adds noise; flows must still track the f32 model
    d = np.abs(np.asarray(oute["flow"][0]) - np.asarray(outf["flow"][0]))
    assert np.mean(d < 0.05) > 0.98


def test_engine_artifact_roundtrip(tmp_path):
    """save_engine -> from_artifact reproduces the engine exactly (flows
    bit-identical; per-unit membrane dtypes and input scale preserved)."""
    from evflow.deploy import save_engine

    model = build_model(_model_cfg())
    B, H, W = 1, 16, 16
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(9), None, jnp.zeros((B, H, W, 2)), states)
    e1 = Int8DeployEngine(model, v, mem_dtype="mixed")
    path = str(tmp_path / "engine.npz")
    save_engine(e1, path)

    e2 = Int8DeployEngine.from_artifact(model, path)
    assert e2.unit_mem_int8 == e1.unit_mem_int8
    assert e2.input_scale == e1.input_scale
    for u1, u2 in zip(e1.params["units"], e2.params["units"]):
        assert set(u1) == set(u2)
        for k in u1:
            assert u1[k].dtype == u2[k].dtype, k
            np.testing.assert_array_equal(
                np.asarray(u1[k], np.float32), np.asarray(u2[k], np.float32))

    cnt = jax.random.poisson(jax.random.PRNGKey(1), 0.3, (B, H, W, 2)).astype(jnp.float32)
    o1, _ = e1.apply(e1.params, None, cnt, e1.init_states(B, H, W))
    o2, _ = e2.apply(e2.params, None, cnt, e2.init_states(B, H, W))
    np.testing.assert_array_equal(np.asarray(o1["flow"][0]), np.asarray(o2["flow"][0]))

    with pytest.raises(ValueError, match="variables or a prepared"):
        Int8DeployEngine(model, None)


def test_engine_pooled_counts_input_scale():
    """Downsample-pooled counts (multiples of 1/(ph*pw)) are EXACT on the
    engine's int8 input grid with input_scale = 1/(ph*pw); with the default
    unit grid they round to zero and destroy the input."""
    model = build_model(_model_cfg())
    B, H, W = 1, 16, 16
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(3), None, jnp.zeros((B, H, W, 2)), states)
    v = _snap_kernels_to_int8_grid(v)

    # pooled counts: integer counts avg-pooled 2x2 -> multiples of 0.25
    key = jax.random.PRNGKey(4)
    raw = jax.random.poisson(key, 0.4, (B, 2 * H, 2 * W, 2)).astype(jnp.float32)
    pooled = raw.reshape(B, H, 2, W, 2, 2).mean(axis=(2, 4))

    outf, _ = model.apply(v, None, pooled, states, train=False)

    e = Int8DeployEngine(model, v, input_scale=0.25)
    oute, _ = e.apply(e.params, None, pooled, e.init_states(B, H, W))
    agree = np.mean(np.abs(np.asarray(outf["flow"][0]) - np.asarray(oute["flow"][0])) < 0.02)
    assert agree > 0.98, agree

    # unit grid: round() zeroes sub-1 counts -> mostly-empty input
    e0 = Int8DeployEngine(model, v)
    xi = jnp.clip(jnp.round(pooled), -127, 127)
    zero_frac = float((xi == 0).mean())
    assert zero_frac > float((jnp.round(pooled / 0.25) == 0).mean())


def test_engine_pre_reciprocal_artifact_compat():
    """Artifacts saved before mem_inv_scale existed still run: _mem_quant
    falls back to dividing by mem_scale; with a power-of-two scale the two
    forms are bit-identical."""
    model = build_model(_model_cfg())
    B, H, W = 1, 16, 16
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(2), None, jnp.zeros((B, H, W, 2)), states)
    scales = [0.5] * model.num_units  # 1/s exact in binary
    e_new = Int8DeployEngine(model, v, mem_dtype="int8", mem_scales=scales)
    e_old = Int8DeployEngine(model, v, mem_dtype="int8", mem_scales=scales)
    for u in e_old.params["units"]:
        del u["mem_inv_scale"]  # simulate a pre-round-5 artifact

    cnt = jax.random.poisson(jax.random.PRNGKey(3), 0.3, (B, H, W, 2)).astype(
        jnp.float32)
    s_new, s_old = e_new.init_states(B, H, W), e_old.init_states(B, H, W)
    for _ in range(3):
        o_new, s_new = e_new.apply(e_new.params, None, cnt, s_new)
        o_old, s_old = e_old.apply(e_old.params, None, cnt, s_old)
    np.testing.assert_array_equal(
        np.asarray(o_new["flow"][0]), np.asarray(o_old["flow"][0])
    )


def test_engine_reciprocal_quant_within_one_code():
    """For non-power-of-two membrane scales, round(x*inv) vs the divide
    fallback round(x/s) may differ by at most one int8 code at .5 rounding
    boundaries — bound the divergence and the resulting flow gap."""
    model = build_model(_model_cfg())
    B, H, W = 1, 16, 16
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(2), None, jnp.zeros((B, H, W, 2)), states)
    scales = [0.3] * model.num_units  # 1/0.3 inexact in binary
    e_new = Int8DeployEngine(model, v, mem_dtype="int8", mem_scales=scales)
    e_old = Int8DeployEngine(model, v, mem_dtype="int8", mem_scales=scales)
    for u in e_old.params["units"]:
        del u["mem_inv_scale"]

    cnt = jax.random.poisson(jax.random.PRNGKey(5), 0.3, (B, H, W, 2)).astype(
        jnp.float32)
    s_new, s_old = e_new.init_states(B, H, W), e_old.init_states(B, H, W)
    for _ in range(3):
        o_new, s_new = e_new.apply(e_new.params, None, cnt, s_new)
        o_old, s_old = e_old.apply(e_old.params, None, cnt, s_old)
    for a, b in zip(s_new, s_old):
        d = np.abs(np.asarray(a.mem, np.int32) - np.asarray(b.mem, np.int32))
        assert d.max() <= 1, f"membrane codes diverged by {d.max()}"
    # flows agree except where a boundary code flipped a spike (rare)
    fn = np.asarray(o_new["flow"][0])
    fo = np.asarray(o_old["flow"][0])
    assert np.mean(np.abs(fn - fo) < 0.02) > 0.99


def test_engine_z_int8_artifact_roundtrip(tmp_path):
    """Calibrated int8-Z engines survive the artifact roundtrip: z_requant /
    z_scale persist, the restored engine re-enables the z path, and flows
    match bit-for-bit."""
    from evflow.deploy import save_engine

    model = build_model(_model_cfg())
    B, H, W = 1, 16, 16
    states = model.init_states(B, H, W)
    v = model.init(jax.random.PRNGKey(5), None, jnp.zeros((B, H, W, 2)), states)
    e1 = Int8DeployEngine(model, v, mem_dtype="bfloat16")
    key = jax.random.PRNGKey(2)
    windows = [
        np.asarray(jax.random.poisson(jax.random.fold_in(key, i), 0.3,
                                      (B, H, W, 2)), np.float32)
        for i in range(3)
    ]
    e1.calibrate_z(windows)
    assert e1.z_int8

    path = str(tmp_path / "engine_z.npz")
    save_engine(e1, path)
    e2 = Int8DeployEngine.from_artifact(model, path)
    assert e2.z_int8  # the restored engine serves the calibrated int8-Z path
    for u1, u2 in zip(e1.params["units"], e2.params["units"]):
        assert "z_requant" in u2 and "z_scale" in u2
        np.testing.assert_array_equal(
            np.asarray(u1["z_requant"], np.float32),
            np.asarray(u2["z_requant"], np.float32))

    cnt = jnp.asarray(windows[0])
    o1, _ = e1.apply(e1.params, None, cnt, e1.init_states(B, H, W))
    o2, _ = e2.apply(e2.params, None, cnt, e2.init_states(B, H, W))
    np.testing.assert_array_equal(np.asarray(o1["flow"][0]),
                                  np.asarray(o2["flow"][0]))
