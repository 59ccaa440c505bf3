"""Native C++ host runtime vs numpy reference implementations."""

import numpy as np
import pytest

from evflow.data import encodings as enc
from evflow.data import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


@pytest.fixture
def events(rng):
    n, H, W = 500, 24, 20
    xs = rng.integers(0, W, n).astype(np.float32)
    ys = rng.integers(0, H, n).astype(np.float32)
    ts = np.sort(rng.uniform(0, 1, n)).astype(np.float32)
    ps = rng.choice([-1.0, 1.0], n).astype(np.float32)
    return xs, ys, ts, ps, (H, W)


def test_count_encoding_matches_numpy(events):
    xs, ys, ts, ps, res = events
    ne = native.NativeEncoder()
    np.testing.assert_allclose(
        ne.count_encoding(xs, ys, ps, res),
        enc.np_events_to_channels(xs, ys, ps, res),
        atol=1e-6,
    )


def test_voxel_encoding_matches_numpy(events):
    xs, ys, ts, ps, res = events
    ne = native.NativeEncoder()
    for bins in (2, 5):
        np.testing.assert_allclose(
            ne.voxel_encoding(xs, ys, ts, ps, bins, res),
            enc.np_events_to_voxel(xs, ys, ts, ps, bins, res),
            atol=1e-5,
        )
    np.testing.assert_allclose(
        ne.voxel_encoding(xs, ys, ts, ps, 3, res, round_ts=True),
        enc.np_events_to_voxel(xs, ys, ts, ps, 3, res, round_ts=True),
        atol=1e-5,
    )


def test_mask_encoding_matches_numpy(events):
    xs, ys, ts, ps, res = events
    ne = native.NativeEncoder()
    np.testing.assert_allclose(
        ne.mask_encoding(xs, ys, ps, res),
        enc.np_events_to_mask(xs, ys, ps, res),
        atol=1e-6,
    )


def test_polarity_mask_matches_numpy(events):
    xs, ys, ts, ps, res = events
    ne = native.NativeEncoder()
    np.testing.assert_allclose(ne.polarity_mask(ps), enc.np_polarity_mask(ps))


def test_normalize_ts():
    ne = native.NativeEncoder()
    ts = np.array([5.0, 6.0, 9.0])
    out, rng_ = ne.normalize_ts(ts)
    np.testing.assert_allclose(out, [0.0, 0.25, 1.0])
    assert rng_ == 4.0


def test_native_lif_matches_export_semantics(rng):
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    mem = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    beta = rng.uniform(0, 1, 3).astype(np.float32)
    theta = rng.uniform(0.1, 0.8, 3).astype(np.float32)
    spk, mem_out = native.lif_forward(x, mem, beta, theta)
    u = beta * mem + x
    espk = (u >= theta).astype(np.float32)
    np.testing.assert_array_equal(spk, espk)
    np.testing.assert_allclose(mem_out, np.where(espk > 0, 0.0, u), atol=1e-6)


def test_native_lif_crosschecks_jax_export_kernel(rng):
    """Deployment parity: native CPU kernel == jax export_lif_step."""
    import jax.numpy as jnp

    from evflow.ops.lif import export_lif_step

    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    mem = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    beta = rng.uniform(0, 1, 4).astype(np.float32)
    theta = rng.uniform(0.1, 0.8, 4).astype(np.float32)
    n_spk, n_mem = native.lif_forward(x, mem, beta, theta)
    j_spk, j_mem = export_lif_step(jnp.array(x), jnp.array(mem), jnp.array(beta), jnp.array(theta))
    np.testing.assert_array_equal(n_spk, np.asarray(j_spk))
    np.testing.assert_allclose(n_mem, np.asarray(j_mem), atol=1e-6)


def test_stream_uses_native_encoder(tmp_path):
    from evflow.data.h5_stream import H5EventStream
    from evflow.data.synthetic import make_dataset

    root = str(tmp_path / "d")
    make_dataset(root, num_sequences=1, resolution=(32, 32), events_per_sec=20000,
                 duration=0.3)
    cfg = {
        "data": {"path": root, "mode": "events", "window": 400},
        "loader": {"resolution": [32, 32], "std_resolution": [32, 32],
                   "batch_size": 1, "augment": [], "seed": 0},
        "hot_filter": {"enabled": False}, "vis": {"bars": False},
    }
    s_native = H5EventStream(cfg, 2)
    assert s_native._native is not None
    b1 = s_native.next_batch()
    cfg2 = dict(cfg, loader=dict(cfg["loader"], native_encoder=False))
    s_np = H5EventStream(cfg2, 2)
    assert s_np._native is None
    b2 = s_np.next_batch()
    np.testing.assert_allclose(b1["event_cnt"], b2["event_cnt"], atol=1e-5)
    np.testing.assert_allclose(b1["event_voxel"], b2["event_voxel"], atol=1e-5)
    s_native.close(); s_np.close()


def test_window_assemble_matches_split_path(rng):
    """Fused ev_window_assemble == formatting + augment + split kernels,
    bit-exact, across polarity conventions / flips / OOB events / voxel."""
    ne = native.NativeEncoder()
    if not ne.has_window_assemble():
        pytest.skip("stale libevflow_host.so without ev_window_assemble")
    for trial in range(40):
        n = int(rng.integers(0, 300)) if trial else 0
        H, W = int(rng.integers(4, 32)), int(rng.integers(4, 32))
        bins = int(rng.integers(2, 5))
        xs = rng.uniform(-2, W + 2, n).astype(np.float32)  # incl. OOB
        ys = rng.uniform(-2, H + 2, n).astype(np.float32)
        ts = np.sort(rng.uniform(100.0, 101.0, n)).astype(np.float64)
        ps = (rng.integers(0, 2, n).astype(np.float32) if rng.integers(0, 2)
              else (rng.integers(0, 2, n) * 2 - 1).astype(np.float32))
        fh, fv, fp = (bool(rng.integers(0, 2)) for _ in range(3))
        bv, rt = bool(rng.integers(0, 2)), bool(rng.integers(0, 2))

        cnt, mask, vox, el, pm, dt, lts = ne.window_assemble(
            xs, ys, ts, ps, (H, W), bins, fh, fv, fp,
            build_voxel=bv, round_ts=rt)

        # the split path of H5EventStream._slot_item, verbatim
        ps2 = ps * 2.0 - 1.0 if ps.size and ps.min() >= 0 else ps.copy()
        tsn = ts.astype(np.float64)
        if tsn.size:
            r = tsn.max() - tsn.min()
            tsn = (tsn - tsn.min()) / r if r > 0 else np.zeros_like(tsn)
        tsn = tsn.astype(np.float32)
        xs2, ys2 = xs.copy(), ys.copy()
        if fh:
            xs2 = W - 1 - xs2
        if fv:
            ys2 = H - 1 - ys2
        if fp:
            ps2 = -ps2
        np.testing.assert_array_equal(cnt, ne.count_encoding(xs2, ys2, ps2, (H, W)))
        np.testing.assert_array_equal(mask, ne.mask_encoding(xs2, ys2, ps2, (H, W)))
        if bv:
            np.testing.assert_array_equal(
                vox, ne.voxel_encoding(xs2, ys2, tsn, ps2, bins, (H, W), rt))
        else:
            assert vox is None
        el2 = np.stack([tsn, ys2, xs2, ps2], -1) if n else np.zeros((0, 4), np.float32)
        np.testing.assert_array_equal(el, el2)
        pm2 = ne.polarity_mask(ps2) if n else np.zeros((0, 2), np.float32)
        np.testing.assert_array_equal(pm, pm2)
        assert dt == (float(ts[-1] - ts[0]) if n else 0.0)
        if n:
            assert lts == float(ts[-1])


def test_window_assemble_nan_guard():
    ne = native.NativeEncoder()
    if not ne.has_window_assemble():
        pytest.skip("stale libevflow_host.so without ev_window_assemble")
    with pytest.raises(ValueError, match="NaN/Inf"):
        ne.window_assemble(
            np.zeros(2, np.float32), np.zeros(2, np.float32),
            np.array([0.0, np.nan]), np.ones(2, np.float32), (4, 4), 2)


def test_stream_fused_path_matches_numpy_stream(tmp_path):
    """Full-loader equality: native fused assembly vs pure-numpy backend,
    with augmentation enabled, across sequence rollovers (same seed → same
    per-slot augment draws on both backends)."""
    from evflow.data.h5_stream import H5EventStream
    from evflow.data.synthetic import make_dataset

    root = str(tmp_path / "d")
    make_dataset(root, num_sequences=2, resolution=(24, 24),
                 events_per_sec=20000, duration=0.3)
    cfg = {
        "data": {"path": root, "mode": "events", "window": 500},
        "loader": {"resolution": [24, 24], "std_resolution": [24, 24],
                   "batch_size": 2, "augment": ["Horizontal", "Vertical", "Polarity"],
                   "augment_prob": [0.5, 0.5, 0.5], "seed": 7},
        "hot_filter": {"enabled": False}, "vis": {"bars": False},
    }
    s_nat = H5EventStream(cfg, 2)
    assert s_nat._native is not None and s_nat._native.has_window_assemble()
    cfg2 = dict(cfg, loader=dict(cfg["loader"], native_encoder=False))
    s_np = H5EventStream(cfg2, 2)
    for _ in range(16):
        b1, b2 = s_nat.next_batch(), s_np.next_batch()
        for k in ("event_cnt", "event_voxel", "event_mask", "event_list",
                  "event_valid", "event_list_pol_mask", "dt_input", "new_seq"):
            np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)
    s_nat.close(); s_np.close()
