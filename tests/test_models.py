"""Model zoo: shapes, state carry, gradient-detach semantics (SURVEY §2 L3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evflow.models.cells import SNNConvLIF, SNNConvLIFRecurrent
from evflow.ops.lif import LIFState
from evflow.registry import build_model, model_names


def base_cfg(name, **kw):
    cfg = {
        "name": name,
        "num_bins": 2,
        "base_num_channels": 8,
        "kernel_size": 3,
        "encoding": "cnt",
        "spiking_neuron": {
            "leak": [0.0, 1.0],
            "thresh": [0.0, 0.8],
            "learn_leak": True,
            "learn_thresh": True,
            "hard_reset": True,
        },
    }
    cfg.update(kw)
    return cfg


@pytest.mark.parametrize("name", ["LIFFireNet", "LIFFireNet_short", "LIFFireFlowNet", "LIFFireFlowNet_short"])
def test_firenet_forward_shapes(name):
    m = build_model(base_cfg(name))
    B, H, W = 2, 16, 16
    cnt = jnp.ones((B, H, W, 2))
    states = m.init_states(B, H, W)
    v = m.init(jax.random.PRNGKey(0), None, cnt, states)
    out, ns = m.apply(v, None, cnt, states)
    assert out["flow"][0].shape == (B, H, W, 2)
    assert len(ns) == (5 if "short" in name else 7)
    # tanh prediction head bounds
    assert float(jnp.abs(out["flow"][0]).max()) <= 1.0


def test_registry_lists_reference_zoo():
    for name in ["LIFFireNet", "LIFFireNet_short", "LIFFireFlowNet", "LIFFireFlowNet_short", "SpikingRecEVFlowNet"]:
        assert name in model_names()


def test_voxel_encoding_path():
    m = build_model(base_cfg("LIFFireNet", encoding="voxel", num_bins=5))
    B, H, W = 1, 16, 16
    vox = jnp.ones((B, H, W, 5))
    states = m.init_states(B, H, W)
    v = m.init(jax.random.PRNGKey(0), vox, None, states)
    out, _ = m.apply(v, vox, None, states)
    assert out["flow"][0].shape == (B, H, W, 2)


def test_activity_logging_keys():
    m = build_model(base_cfg("LIFFireNet"))
    B, H, W = 1, 16, 16
    cnt = jnp.ones((B, H, W, 2))
    states = m.init_states(B, H, W)
    v = m.init(jax.random.PRNGKey(0), None, cnt, states)
    out, _ = m.apply(v, None, cnt, states, log=True)
    assert list(out["activity"]) == [
        "0:input", "1:head", "2:G1", "3:R1a", "4:R1b", "5:G2", "6:R2a", "7:R2b", "8:pred",
    ]
    assert all(0.0 <= float(v) <= 1.0 for v in out["activity"].values())


def test_recurrent_state_affects_output():
    """G1/G2 recurrence: previous spikes change the next output."""
    m = build_model(base_cfg("LIFFireNet"))
    B, H, W = 1, 16, 16
    cnt = jnp.ones((B, H, W, 2))
    s0 = m.init_states(B, H, W)
    v = m.init(jax.random.PRNGKey(0), None, cnt, s0)
    _, s1 = m.apply(v, None, cnt, s0)
    out_a, _ = m.apply(v, None, cnt, s0)
    out_b, _ = m.apply(v, None, cnt, s1)
    assert not np.allclose(np.asarray(out_a["flow"][0]), np.asarray(out_b["flow"][0]))


def test_mem_carry_is_detached_but_spike_carry_is_not():
    """Per-step TBPTT semantics (SNNtorch_spiking_submodules.py:307-311):
    grads through the membrane carry are cut; grads through the recurrent
    spike carry flow."""
    x = jnp.ones((1, 8, 8, 4))
    zeros = jnp.zeros((1, 8, 8, 4))

    # Feedforward cell: the only cross-step path is the membrane carry,
    # which is stop_gradient'ed -> two-step grad w.r.t. initial mem is zero.
    ff_cell = SNNConvLIF(input_size=4, features=4)
    v_ff = ff_cell.init(jax.random.PRNGKey(1), x, LIFState(zeros, zeros))

    def chained_ff(mem_in):
        _, s1 = ff_cell.apply(v_ff, x, LIFState(mem_in, zeros))
        spk2, _ = ff_cell.apply(v_ff, x, s1)
        return spk2.sum()

    g = jax.grad(chained_ff)(jnp.full((1, 8, 8, 4), 0.3))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)

    # Recurrent cell: the spike carry is NOT detached, so gradients flow
    # across steps through the recurrent conv (within a loss window).
    rec_cell = SNNConvLIFRecurrent(input_size=4, features=4)
    v_rec = rec_cell.init(jax.random.PRNGKey(1), x, LIFState(zeros, zeros))

    def two_step_loss(variables):
        spk1, s1 = rec_cell.apply(variables, x, LIFState(zeros, zeros))
        spk2, _ = rec_cell.apply(variables, x, s1)
        return spk2.sum()

    g_params = jax.grad(two_step_loss)(v_rec)["params"]
    rec_grad = np.abs(np.asarray(g_params["rec"]["kernel"])).sum()
    assert rec_grad > 0.0


def test_batch_stats_update_in_train_mode():
    cell = SNNConvLIF(input_size=2, features=4)
    x = jnp.ones((2, 8, 8, 2)) * 3.0
    v = cell.init(jax.random.PRNGKey(0), x, None)
    before = np.asarray(v["batch_stats"]["bn"]["BatchNorm_0"]["mean"]).copy()
    _, mut = cell.apply(v, x, None, True, mutable=["batch_stats"])
    after = np.asarray(mut["batch_stats"]["bn"]["BatchNorm_0"]["mean"])
    assert not np.allclose(before, after)


def test_eval_mode_does_not_mutate_stats():
    cell = SNNConvLIF(input_size=2, features=4)
    x = jnp.ones((2, 8, 8, 2))
    v = cell.init(jax.random.PRNGKey(0), x, None)
    out, state = cell.apply(v, x, None, False)  # no mutable needed
    assert out.shape == (2, 8, 8, 4)


def test_spiking_rec_evflownet_multires():
    m = build_model(base_cfg("SpikingRecEVFlowNet",
                            spiking_neuron={"leak": [-4.0, 0.1], "thresh": [0.8, 0.0]}))
    B, H, W = 1, 48, 48
    cnt = jnp.ones((B, H, W, 2))
    states = m.init_states(B, H, W)
    assert len(states) == 16
    v = m.init(jax.random.PRNGKey(0), None, cnt, states)
    out, ns = m.apply(v, None, cnt, states)
    assert len(out["flow"]) == 4
    for f in out["flow"]:
        assert f.shape == (B, H, W, 2)


def test_tebn_timestep_scaling():
    cfg = base_cfg("LIFFireNet")
    cfg["tebn"] = {"enabled": True, "num_timesteps": 4}
    m = build_model(cfg)
    B, H, W = 1, 16, 16
    cnt = jnp.ones((B, H, W, 2))
    states = m.init_states(B, H, W)
    v = m.init(jax.random.PRNGKey(0), None, cnt, states, timestep=0)
    out, _ = m.apply(v, None, cnt, states, timestep=jnp.array(1))
    assert out["flow"][0].shape == (B, H, W, 2)


def test_mpbn_cell():
    cfg = base_cfg("LIFFireNet_short")
    cfg["mpbn"] = {"enabled": True}
    m = build_model(cfg)
    B, H, W = 2, 16, 16
    cnt = jnp.ones((B, H, W, 2))
    states = m.init_states(B, H, W)
    v = m.init(jax.random.PRNGKey(0), None, cnt, states, train=True)
    (out, _), mut = m.apply(v, None, cnt, states, train=True, mutable=["batch_stats"])
    assert out["flow"][0].shape == (B, H, W, 2)


def test_sigmoid_cell_family():
    cfg = base_cfg("LIFFireNet", cell_family="sigmoid",
                   spiking_neuron={"leak": [-4.0, 0.1], "thresh": [0.8, 0.0]})
    m = build_model(cfg)
    B, H, W = 1, 16, 16
    cnt = jnp.ones((B, H, W, 2))
    states = m.init_states(B, H, W)
    v = m.init(jax.random.PRNGKey(0), None, cnt, states)
    out, _ = m.apply(v, None, cnt, states)
    assert out["flow"][0].shape == (B, H, W, 2)


def test_im2col_conv_matches_lax_conv():
    """ConvIm2col == nn.Conv for identical kernels (checkpoint compatible)."""
    import flax.linen as nn_
    from evflow.models.cells import ConvIm2col

    rng_np = np.random.default_rng(0)
    x = jnp.asarray(rng_np.normal(size=(2, 12, 10, 4)).astype(np.float32))
    im = ConvIm2col(6, 3)
    v = im.init(jax.random.PRNGKey(0), x)
    ref = nn_.Conv(6, (3, 3), padding="SAME", use_bias=False)
    y_im = im.apply(v, x)
    y_ref = ref.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
    np.testing.assert_allclose(np.asarray(y_im), np.asarray(y_ref), atol=1e-5)

    # 1x1 and 5x5 kernels too
    for k in (1, 5):
        imk = ConvIm2col(3, k)
        vk = imk.init(jax.random.PRNGKey(1), x)
        yk = imk.apply(vk, x)
        yr = nn_.Conv(3, (k, k), padding="SAME", use_bias=False).apply(
            {"params": {"kernel": vk["params"]["kernel"]}}, x)
        np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), atol=1e-5)


def test_conv_impl_checkpoint_interchange():
    """Same params run under both conv implementations with equal outputs."""
    cfg = base_cfg("LIFFireNet_short")
    m_lax = build_model(dict(cfg, conv_impl="lax"))
    m_mm = build_model(dict(cfg, conv_impl="im2col"))
    B, H, W = 1, 16, 16
    cnt = jnp.ones((B, H, W, 2))
    states = m_lax.init_states(B, H, W)
    v = m_lax.init(jax.random.PRNGKey(0), None, cnt, states)
    out_a, _ = m_lax.apply(v, None, cnt, states)
    out_b, _ = m_mm.apply(v, None, cnt, states)
    np.testing.assert_allclose(np.asarray(out_a["flow"][0]),
                               np.asarray(out_b["flow"][0]), atol=1e-5)


def test_temporal_cnt_mode(tmp_path):
    from evflow.data.h5_stream import H5EventStream
    from evflow.data.synthetic import make_dataset

    root = str(tmp_path / "d")
    make_dataset(root, num_sequences=1, resolution=(32, 32), events_per_sec=20000,
                 duration=0.3)
    cfg = {
        "data": {"path": root, "mode": "events", "window": 400},
        "model": {"temporal_cnt": True},
        "loader": {"resolution": [32, 32], "std_resolution": [32, 32],
                   "batch_size": 1, "augment": [], "seed": 0},
        "hot_filter": {"enabled": False}, "vis": {"bars": False},
    }
    s = H5EventStream(cfg, 2)
    b1 = s.next_batch()
    # first window: prev channel is zeros
    assert np.allclose(b1["event_cnt"][0, ..., 1], 0.0)
    b2 = s.next_batch()
    # second window: prev channel == first window's (pos - neg)
    assert not np.allclose(b2["event_cnt"][0, ..., 1], 0.0)
    s.close()


def test_multires_unet_ann():
    from evflow.models.unet import MultiResUNet

    m = MultiResUNet(num_bins=2, base_num_channels=4, num_encoders=2,
                     num_residual_blocks=1)
    x = jnp.ones((1, 32, 32, 2))
    v = m.init(jax.random.PRNGKey(0), x)
    preds = m.apply(v, x)
    assert len(preds) == 2
    assert preds[-1].shape == (1, 32, 32, 2)


def test_conv_layer_stateful():
    from evflow.models.ann import ConvLayerStateful

    m = ConvLayerStateful(4)
    x = jnp.ones((1, 8, 8, 2))
    v = m.init(jax.random.PRNGKey(0), x, None)
    out, st = m.apply(v, x, None, residual=1.0)
    assert out.shape == (1, 8, 8, 4)


def test_spiking_transposed_raises():
    from evflow.models.unet import SpikingTransposedConvLayer

    with pytest.raises(NotImplementedError):
        SpikingTransposedConvLayer()(None, None)


def test_dypack_conv_matches_lax_f32():
    """dy-packed 3x3 conv (evflow/ops/dypack.py) is the same math as a SAME
    lax conv — bit-level parity in f32 up to summation order."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from evflow.ops.dypack import conv3x3_dypack

    rng = jax.random.PRNGKey(3)
    for H, W in ((16, 20), (17, 23)):  # incl. odd, non-square sensor crops
        x = jax.random.normal(rng, (2, H, W, 8))
        k = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 8, 8))
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        out = conv3x3_dypack(x, k)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_dypack_int8_matches_quantized_reference():
    """int8 dy-pack == explicit int8 GEMM semantics: exact for spike inputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from evflow.ops.dypack import conv3x3_dypack

    rng = jax.random.PRNGKey(5)
    x = (jax.random.uniform(rng, (1, 12, 12, 8)) < 0.3).astype(jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 8, 8)) * 0.1
    # reference: quantize weights per-tensor, run exact f32 conv on dequantized
    wp = np.asarray(k)
    s = np.abs(wp).max() / 127.0
    wq = np.clip(np.round(wp / s), -127, 127) * s
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(wq, jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = conv3x3_dypack(x, k, int8=True).astype(jnp.float32)
    # int32 accumulation is exact; only the bf16 Z cast and s_w rounding differ
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_model_dypack_matches_im2col():
    """FireNet with conv_impl='dypack' (f32) == conv_impl='im2col'."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from evflow.registry import build_model

    cfg = {
        "name": "LIFFireNet_short", "encoding": "cnt", "num_bins": 2,
        "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
        "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
    }
    m1 = build_model({**cfg, "conv_impl": "im2col"})
    m2 = build_model({**cfg, "conv_impl": "dypack"})
    st = m1.init_states(1, 16, 16)
    x = jax.random.poisson(jax.random.PRNGKey(0), 0.3, (1, 16, 16, 2)).astype(jnp.float32)
    v = m1.init(jax.random.PRNGKey(1), None, x, st)
    o1, s1 = m1.apply(v, None, x, st)
    o2, s2 = m2.apply(v, None, x, st)
    np.testing.assert_allclose(
        np.asarray(o1["flow"][0]), np.asarray(o2["flow"][0]), rtol=1e-5, atol=1e-6
    )


def test_dypack_dual_matches_two_convs():
    """conv3x3_dypack_dual == conv(x1,k1) + conv(x2,k2) in f32."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from evflow.ops.dypack import conv3x3_dypack, conv3x3_dypack_dual

    rng = jax.random.PRNGKey(11)
    x1 = jax.random.normal(rng, (2, 12, 16, 4))
    x2 = jax.random.normal(jax.random.fold_in(rng, 1), (2, 12, 16, 8))
    k1 = jax.random.normal(jax.random.fold_in(rng, 2), (3, 3, 4, 8))
    k2 = jax.random.normal(jax.random.fold_in(rng, 3), (3, 3, 8, 8))
    ref = conv3x3_dypack(x1, k1) + conv3x3_dypack(x2, k2)
    out = conv3x3_dypack_dual(x1, x2, k1, k2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_model_dypack_int8_runs_and_approximates():
    """FireNet with conv_impl='dypack_int8' (fused dual rec cells) stays close
    to the f32 path on spike-like inputs (weights int8-quantized)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from evflow.registry import build_model

    cfg = {
        "name": "LIFFireNet_short", "encoding": "cnt", "num_bins": 2,
        "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
        "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
    }
    m1 = build_model({**cfg, "conv_impl": "im2col"})
    m2 = build_model({**cfg, "conv_impl": "dypack_int8"})
    st = m1.init_states(1, 16, 16)
    x = jax.random.poisson(jax.random.PRNGKey(0), 0.5, (1, 16, 16, 2)).astype(jnp.float32)
    v = m1.init(jax.random.PRNGKey(1), None, x, st)
    # param trees are interchangeable (KernelHolder preserves ff/rec paths)
    o1, s1 = m1.apply(v, None, x, st)
    o2, s2 = m2.apply(v, None, x, st)
    f1, f2 = np.asarray(o1["flow"][0]), np.asarray(o2["flow"][0])
    assert np.isfinite(f2).all()
    # int8 weight quant error only; flows are tanh-bounded
    assert np.abs(f1 - f2).max() < 0.05


def test_cols_dx_dual_equals_nested_concat():
    """cols_dx_dual (one flat 6-slice concat) is bit-identical to
    concat([cols_dx(a), cols_dx(b)]) — the deploy engine's dual-GEMM lhs
    ordering must match the packed [k_ff; k_rec] kernel rows."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from evflow.ops.dypack import cols_dx, cols_dx_dual

    rng = jax.random.PRNGKey(5)
    a = jax.random.normal(rng, (2, 6, 10, 4))
    b = jax.random.normal(jax.random.fold_in(rng, 1), (2, 6, 10, 3))
    ref = jnp.concatenate([cols_dx(a), cols_dx(b)], axis=-1)
    out = cols_dx_dual(a, b)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
