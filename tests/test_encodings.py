"""Event encodings vs. hand-computed values (dataloader/encodings.py semantics)."""

import jax.numpy as jnp
import numpy as np

from evflow.data import encodings as enc


def tiny_events():
    xs = np.array([0, 1, 1, 2], np.float32)
    ys = np.array([0, 0, 1, 2], np.float32)
    ts = np.array([0.0, 0.25, 0.5, 1.0], np.float32)
    ps = np.array([1.0, -1.0, 1.0, 1.0], np.float32)
    return xs, ys, ts, ps


def test_events_to_image_accumulates():
    xs = np.array([1, 1, 2], np.float32)
    ys = np.array([0, 0, 1], np.float32)
    ps = np.array([1.0, 1.0, -1.0], np.float32)
    img = enc.np_events_to_image(xs, ys, ps, (3, 4))
    assert img[0, 1] == 2.0 and img[1, 2] == -1.0 and img.sum() == 1.0


def test_voxel_bilinear_weights():
    """num_bins=2: weight_b = max(0, 1 - |ts*(B-1) - b|)."""
    xs, ys, ts, ps = tiny_events()
    vox = enc.np_events_to_voxel(xs, ys, ts, ps, 2, (3, 3))
    assert vox.shape == (3, 3, 2)
    # event0: ts=0 -> bin0 w=1; event1: ts=.25 -> w0=.75, w1=.25 (p=-1)
    assert vox[0, 0, 0] == 1.0 and vox[0, 0, 1] == 0.0
    np.testing.assert_allclose(vox[0, 1, 0], -0.75)
    np.testing.assert_allclose(vox[0, 1, 1], -0.25)
    # event3: ts=1 -> all in bin1
    assert vox[2, 2, 1] == 1.0 and vox[2, 2, 0] == 0.0


def test_voxel_round_ts():
    xs, ys, ts, ps = tiny_events()
    vox = enc.np_events_to_voxel(xs, ys, ts, ps, 2, (3, 3), round_ts=True)
    # ts=.25 rounds to bin 0 entirely
    np.testing.assert_allclose(vox[0, 1, 0], -1.0)
    np.testing.assert_allclose(vox[0, 1, 1], 0.0)


def test_channels_counts_per_polarity():
    xs, ys, ts, ps = tiny_events()
    cnt = enc.np_events_to_channels(xs, ys, ps, (3, 3))
    assert cnt.shape == (3, 3, 2)
    assert cnt[0, 0, 0] == 1.0 and cnt[0, 1, 1] == 1.0  # |counts|, both positive
    assert cnt[..., 0].sum() == 3.0 and cnt[..., 1].sum() == 1.0


def test_mask_is_binary():
    xs, ys, ts, ps = tiny_events()
    mask = enc.np_events_to_mask(xs, ys, ps, (3, 3))
    assert mask.shape == (3, 3, 1)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    assert mask.sum() == 4.0


def test_polarity_mask():
    ps = np.array([1.0, -1.0, 1.0], np.float32)
    pm = enc.np_polarity_mask(ps)
    np.testing.assert_array_equal(pm, [[1, 0], [0, 1], [1, 0]])


def test_hot_mask_zeroes_hot_pixels():
    rate = np.zeros((4, 4), np.float32)
    rate[1, 2] = 0.95
    rate[3, 3] = 0.9
    rate[0, 0] = 0.5
    mask = enc.np_hot_event_mask(rate.copy(), idx=10, max_px=100, min_obvs=5, max_rate=0.8)
    assert mask[1, 2] == 0 and mask[3, 3] == 0 and mask[0, 0] == 1
    # below min_obvs: no filtering yet
    mask2 = enc.np_hot_event_mask(rate.copy(), idx=3)
    assert mask2.min() == 1.0


def test_jnp_matches_np(rng):
    H, W, N = 16, 12, 200
    xs = rng.integers(0, W, N).astype(np.float32)
    ys = rng.integers(0, H, N).astype(np.float32)
    ts = np.sort(rng.uniform(0, 1, N)).astype(np.float32)
    ps = rng.choice([-1.0, 1.0], N).astype(np.float32)

    np.testing.assert_allclose(
        np.asarray(enc.jnp_events_to_image(jnp.array(xs), jnp.array(ys), jnp.array(ps), (H, W))),
        enc.np_events_to_image(xs, ys, ps, (H, W)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(enc.jnp_events_to_voxel(jnp.array(xs), jnp.array(ys), jnp.array(ts), jnp.array(ps), 5, (H, W))),
        enc.np_events_to_voxel(xs, ys, ts, ps, 5, (H, W)),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(enc.jnp_events_to_channels(jnp.array(xs), jnp.array(ys), jnp.array(ps), (H, W))),
        enc.np_events_to_channels(xs, ys, ps, (H, W)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(enc.jnp_events_to_mask(jnp.array(xs), jnp.array(ys), jnp.array(ps), (H, W))),
        enc.np_events_to_mask(xs, ys, ps, (H, W)),
        atol=1e-6,
    )


def test_jnp_padding_mask(rng):
    H, W, N = 8, 8, 32
    xs = rng.integers(0, W, N).astype(np.float32)
    ys = rng.integers(0, H, N).astype(np.float32)
    ps = np.ones(N, np.float32)
    valid = np.ones(N, np.float32)
    valid[20:] = 0.0
    img = enc.jnp_events_to_image(jnp.array(xs), jnp.array(ys), jnp.array(ps), (H, W), valid=jnp.array(valid))
    assert float(np.asarray(img).sum()) == 20.0
