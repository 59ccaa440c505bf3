"""IWE warp/splat kernels vs. independent numpy math (utils/iwe.py semantics)."""

import jax.numpy as jnp
import numpy as np

from evflow.ops import iwe


def np_bilinear_splat(events, flow, tref, res, scaling):
    """Independent bilinear splat: 4-corner weights, out-of-bounds purged."""
    H, W = res
    B, N, _ = events.shape
    img = np.zeros((B, H, W), np.float32)
    for b in range(B):
        for n in range(N):
            ts, y, x, p = events[b, n]
            fy, fx = flow[b, n]
            wy = y + (tref - ts) * fy * scaling
            wx = x + (tref - ts) * fx * scaling
            for cy in (np.floor(wy), np.floor(wy + 1)):
                for cx in (np.floor(wx), np.floor(wx + 1)):
                    w = max(0.0, 1 - abs(wy - cy)) * max(0.0, 1 - abs(wx - cx))
                    if 0 <= cy < H and 0 <= cx < W:
                        img[b, int(cy), int(cx)] += w
    return img


def make_events(rng, B, N, H, W):
    ts = rng.uniform(0, 1, (B, N)).astype(np.float32)
    ys = rng.integers(0, H, (B, N)).astype(np.float32)
    xs = rng.integers(0, W, (B, N)).astype(np.float32)
    ps = rng.choice([-1.0, 1.0], (B, N)).astype(np.float32)
    return np.stack([ts, ys, xs, ps], axis=-1)


def test_bilinear_interpolation_matches_numpy(rng):
    H, W, B, N = 12, 10, 2, 40
    events = make_events(rng, B, N, H, W)
    flow = rng.normal(0, 0.02, (B, N, 2)).astype(np.float32)
    idx, weights = iwe.get_interpolation(jnp.array(events), jnp.array(flow), 1.0, (H, W), 32.0)
    img = iwe.interpolate(idx, weights, (H, W))
    expected = np_bilinear_splat(events, flow, 1.0, (H, W), 32.0)
    np.testing.assert_allclose(np.asarray(img), expected, atol=1e-4)


def test_round_idx_counts_events(rng):
    H, W, B, N = 8, 8, 1, 30
    events = make_events(rng, B, N, H, W)
    flow = np.zeros((B, N, 2), np.float32)
    idx, weights = iwe.get_interpolation(
        jnp.array(events), jnp.array(flow), 0.0, (H, W), 128.0, round_idx=True
    )
    img = iwe.interpolate(idx, weights, (H, W))
    # zero flow, tref irrelevant at scale 0 displacement: every event lands on its pixel
    assert float(np.asarray(img).sum()) == N


def test_zero_flow_weights_sum_preserved(rng):
    """Bilinear weights of an in-bounds event always sum to 1."""
    H, W = 16, 16
    events = make_events(rng, 1, 50, H - 2, W - 2)
    events[..., 1:3] += 0.5  # fractional coords away from the border
    flow = np.zeros((1, 50, 2), np.float32)
    idx, weights = iwe.get_interpolation(jnp.array(events), jnp.array(flow), 0.5, (H, W), 128.0)
    np.testing.assert_allclose(float(np.asarray(weights).sum()), 50.0, rtol=1e-5)


def test_valid_mask_zeroes_padded_events(rng):
    H, W = 8, 8
    events = make_events(rng, 1, 20, H, W)
    flow = np.zeros((1, 20, 2), np.float32)
    valid = np.ones((1, 20), np.float32)
    valid[0, 10:] = 0.0
    idx, weights = iwe.get_interpolation(
        jnp.array(events), jnp.array(flow), 0.0, (H, W), 128.0, valid=jnp.array(valid)
    )
    img = iwe.interpolate(idx, weights, (H, W))
    assert float(np.asarray(img).sum()) == 10.0


def test_lookup_event_flow_gather(rng):
    H, W = 6, 5
    flow_map = rng.normal(size=(1, H, W, 2)).astype(np.float32)
    events = make_events(rng, 1, 12, H, W)
    out = iwe.lookup_event_flow(jnp.array(flow_map), jnp.array(events))
    for n in range(12):
        y, x = int(events[0, n, 1]), int(events[0, n, 2])
        # output order (y, x); map channels (x, y)
        np.testing.assert_allclose(np.asarray(out[0, n]), flow_map[0, y, x, ::-1], rtol=1e-6)


def test_deblur_sharpens_with_true_flow():
    """Contrast-maximization sanity: warping with the true flow concentrates
    events onto fewer pixels than zero flow (tools/demo_iwe.py behavior)."""
    H, W, N = 32, 32, 256
    rng = np.random.default_rng(1)
    # events from a single moving edge: x = x0 + v * t
    t = rng.uniform(0, 1, N).astype(np.float32)
    y = rng.integers(4, 28, N).astype(np.float32)
    v = 8.0  # pixels over the window
    x0 = rng.integers(4, 20, N).astype(np.float32)
    x = x0 + v * t
    events = np.stack([t, y, x, np.ones_like(t)], axis=-1)[None]
    scaling = 16.0

    def nonzero_px(flow_val):
        fm = np.zeros((1, H, W, 2), np.float32)
        fm[..., 0] = flow_val / scaling  # x-flow channel
        img = iwe.deblur_events(jnp.array(fm), jnp.array(events), (H, W), scaling, round_idx=False)
        return int((np.asarray(img) > 1e-4).sum())

    assert nonzero_px(v) < nonzero_px(0.0)


def test_compute_pol_iwe_shapes(rng):
    H, W = 8, 8
    events = make_events(rng, 2, 16, H, W)
    fm = np.zeros((2, H, W, 2), np.float32)
    pos = (events[..., 3] > 0).astype(np.float32)
    neg = (events[..., 3] < 0).astype(np.float32)
    out = iwe.compute_pol_iwe(jnp.array(fm), jnp.array(events), (H, W), jnp.array(pos), jnp.array(neg))
    assert out.shape == (2, H, W, 2)
    total = float(np.asarray(out).sum())
    assert total == 32.0  # every event lands in exactly one polarity channel


def test_upsample_flow_nearest():
    flow = jnp.arange(8.0).reshape(1, 2, 2, 2)
    up = iwe.upsample_flow(flow, 4, 4)
    assert up.shape == (1, 4, 4, 2)
    np.testing.assert_array_equal(np.asarray(up[0, :2, :2, 0]), np.asarray(flow[0, 0, 0, 0]) * np.ones((2, 2)))


def test_interpolate_multi_matches_separate(rng):
    """One C-channel scatter == C separate scatters over shared indices."""
    import jax.numpy as jnp

    from evflow.ops.iwe import interpolate, interpolate_multi

    B, M, H, W = 2, 64, 8, 9
    idx = jnp.asarray(rng.integers(0, H * W, (B, M)), jnp.int32)
    w = jnp.asarray(rng.uniform(0, 1, (B, M, 3)), jnp.float32)
    multi = interpolate_multi(idx, w, (H, W))
    for c in range(3):
        sep = interpolate(idx, w[..., c], (H, W))
        np.testing.assert_allclose(np.asarray(multi[..., c]), np.asarray(sep),
                                   rtol=1e-6)
