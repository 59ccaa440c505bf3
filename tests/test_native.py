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
