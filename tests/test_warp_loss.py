"""EventWarping loss vs. an independent numpy implementation + CM properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evflow.loss.warp_loss import event_warping_loss


def np_loss(flow_maps, events, pol_mask, event_mask, valid, flow_scaling, weight,
            smoothing_mask=False):
    """Independent loop implementation of the contrast-max loss (single scale),
    following loss/flow.py:178-303 math."""
    P, B, N, _ = events.shape
    H, W = flow_maps.shape[2:4]
    max_ts = float(P)

    # gather per-event flow from its own pass, offset ts
    ev = []
    fl = []
    va = []
    pm = []
    for p in range(P):
        for n in range(N):
            for b in range(B):
                pass
    ev = np.array(events, np.float64).copy()
    ev[..., 0] += np.arange(P)[:, None, None]

    def splat(b, items, tref, use_ts):
        img = np.zeros(H * W)
        img_w = np.zeros(H * W)
        for p in range(P):
            for n in range(N):
                if valid[p, b, n] == 0:
                    continue
                ts, y, x, _ = ev[p, b, n]
                fy, fx = flow_ev[p, b, n]
                wy = y + (tref - ts) * fy * flow_scaling
                wx = x + (tref - ts) * fx * flow_scaling
                tsv = ts if use_ts == "fw" else (max_ts - ts)
                for cy in (np.floor(wy), np.floor(wy) + 1):
                    for cx in (np.floor(wx), np.floor(wx) + 1):
                        w = max(0, 1 - abs(wy - cy)) * max(0, 1 - abs(wx - cx))
                        if 0 <= cy < H and 0 <= cx < W:
                            k = int(cy) * W + int(cx)
                            if items[p, b, n] > 0:
                                img[k] += w
                                img_w[k] += w * tsv
        return img, img_w

    # per-event flow lookup
    flow_ev = np.zeros((P, B, N, 2))
    for p in range(P):
        for b in range(B):
            for n in range(N):
                y, x = int(ev[p, b, n, 1]), int(ev[p, b, n, 2])
                fx_, fy_ = flow_maps[p, b, y, x]
                flow_ev[p, b, n] = (fy_, fx_)

    total = 0.0
    for b in range(B):
        for tref, d in ((max_ts, "fw"), (0.0, "bw")):
            l = 0.0
            nz = np.zeros(H * W)
            for pol in range(2):
                img, img_ts = splat(b, pol_mask[..., pol], tref, d)
                ts_avg = img_ts / (img + 1e-9) / max_ts
                l += (ts_avg ** 2).sum()
                nz += img
            l /= max(1.0, (nz > 0).sum())
            total += l

    # smoothness
    fx = np.moveaxis(flow_maps[..., 0], 0, 1)  # [B,P,H,W]
    fy = np.moveaxis(flow_maps[..., 1], 0, 1)

    def charb(x):
        return np.sqrt(x * x + 1e-6)

    mask = np.moveaxis(event_mask[..., 0], 0, 1) if smoothing_mask else None
    terms = []
    def add(sl1, sl2):
        d_ = (fx[..., sl1[0], sl1[1]] - fx[..., sl2[0], sl2[1]]) + (
            fy[..., sl1[0], sl1[1]] - fy[..., sl2[0], sl2[1]])
        c = charb(d_)
        if mask is not None:
            c = c * mask[..., sl1[0], sl1[1]] * mask[..., sl2[0], sl2[1]]
        terms.append(c.sum())
    s = np.index_exp
    add(s[:, :-1], s[:, 1:])
    add(s[:-1, :], s[1:, :])
    add(s[:-1, :-1], s[1:, 1:])
    add(s[1:, :-1], s[:-1, 1:])
    comp = 4
    if P > 1:
        dt = charb((fx[:, :-1] - fx[:, 1:]) + (fy[:, :-1] - fy[:, 1:]))
        if mask is not None:
            dt = dt * (mask[:, :-1] * mask[:, 1:])
        terms.append(dt.sum())
        comp += 1
    smooth = sum(terms) / comp / P
    return total + weight * smooth


def make_window(rng, P=2, B=1, N=24, H=10, W=10):
    ts = rng.uniform(0, 1, (P, B, N)).astype(np.float32)
    ys = rng.integers(0, H, (P, B, N)).astype(np.float32)
    xs = rng.integers(0, W, (P, B, N)).astype(np.float32)
    ps = rng.choice([-1.0, 1.0], (P, B, N)).astype(np.float32)
    events = np.stack([ts, ys, xs, ps], -1)
    pol = np.stack([(ps > 0).astype(np.float32), (ps < 0).astype(np.float32)], -1)
    valid = np.ones((P, B, N), np.float32)
    mask = np.zeros((P, B, H, W, 1), np.float32)
    for p in range(P):
        for b in range(B):
            for n in range(N):
                mask[p, b, int(ys[p, b, n]), int(xs[p, b, n]), 0] = 1.0
    return events, pol, valid, mask


def test_matches_numpy_reference(rng):
    P, B, N, H, W = 2, 1, 24, 10, 10
    events, pol, valid, mask = make_window(rng, P, B, N, H, W)
    flow_maps = rng.normal(0, 0.05, (P, B, H, W, 2)).astype(np.float32)
    got = event_warping_loss(
        [jnp.array(flow_maps)], jnp.array(events), jnp.array(pol),
        jnp.array(mask), jnp.array(valid),
        flow_scaling=10.0, smoothness_weight=0.001,
    )
    want = np_loss(flow_maps, events, pol, mask, valid, 10.0, 0.001)
    np.testing.assert_allclose(float(got), want, rtol=2e-4)


def test_matches_numpy_reference_with_smoothing_mask(rng):
    P, B, N, H, W = 2, 2, 16, 8, 8
    events, pol, valid, mask = make_window(rng, P, B, N, H, W)
    flow_maps = rng.normal(0, 0.05, (P, B, H, W, 2)).astype(np.float32)
    got = event_warping_loss(
        [jnp.array(flow_maps)], jnp.array(events), jnp.array(pol),
        jnp.array(mask), jnp.array(valid),
        flow_scaling=8.0, smoothness_weight=0.01, smoothing_mask=True,
    )
    want = np_loss(flow_maps, events, pol, mask, valid, 8.0, 0.01, smoothing_mask=True)
    np.testing.assert_allclose(float(got), want, rtol=2e-4)


def test_true_flow_beats_zero_flow():
    """Contrast maximization: constant-motion events give a lower loss when
    compensated with their true flow (demo_iwe.py sanity property)."""
    rng = np.random.default_rng(7)
    P, B, N, H, W = 1, 1, 300, 24, 24
    v = 6.0  # px over window
    t = rng.uniform(0, 1, N).astype(np.float32)
    y = rng.integers(4, 20, N).astype(np.float32)
    x0 = rng.integers(2, 14, N).astype(np.float32)
    x = np.clip(x0 + v * t, 0, W - 1)
    ps = np.ones(N, np.float32)
    events = np.stack([t, y, x, ps], -1)[None, None]
    pol = np.stack([np.ones(N), np.zeros(N)], -1)[None, None].astype(np.float32)
    valid = np.ones((P, B, N), np.float32)
    mask = np.ones((P, B, H, W, 1), np.float32)
    scaling = 12.0

    def loss_at(fx):
        fm = np.zeros((P, B, H, W, 2), np.float32)
        fm[..., 0] = fx / scaling
        return float(event_warping_loss(
            [jnp.array(fm)], jnp.array(events), jnp.array(pol), jnp.array(mask),
            jnp.array(valid), flow_scaling=scaling, smoothness_weight=0.0,
        ))

    assert loss_at(v) < loss_at(0.0)
    assert loss_at(v) < loss_at(-v)


def test_gradient_flows_to_flow_maps(rng):
    P, B, N, H, W = 2, 1, 20, 8, 8
    events, pol, valid, mask = make_window(rng, P, B, N, H, W)
    flow_maps = jnp.array(rng.normal(0, 0.05, (P, B, H, W, 2)).astype(np.float32))

    g = jax.grad(lambda fm: event_warping_loss(
        [fm], jnp.array(events), jnp.array(pol), jnp.array(mask), jnp.array(valid),
        flow_scaling=8.0, smoothness_weight=0.001,
    ))(flow_maps)
    assert float(jnp.abs(g).sum()) > 0.0
    assert not bool(jnp.isnan(g).any())


def test_overwrite_intermediate_mode(rng):
    P, B, N, H, W = 3, 1, 16, 8, 8
    events, pol, valid, mask = make_window(rng, P, B, N, H, W)
    flow_maps = jnp.array(rng.normal(0, 0.05, (P, B, H, W, 2)).astype(np.float32))
    out = event_warping_loss(
        [flow_maps], jnp.array(events), jnp.array(pol), jnp.array(mask),
        jnp.array(valid), flow_scaling=8.0, smoothness_weight=0.001,
        overwrite_intermediate=True,
    )
    assert np.isfinite(float(out))


def test_padded_events_do_not_contribute(rng):
    P, B, N, H, W = 1, 1, 16, 8, 8
    events, pol, valid, mask = make_window(rng, P, B, N, H, W)
    flow_maps = jnp.array(rng.normal(0, 0.05, (P, B, H, W, 2)).astype(np.float32))

    def run(ev, po, va):
        return float(event_warping_loss(
            [flow_maps], jnp.array(ev), jnp.array(po), jnp.array(mask), jnp.array(va),
            flow_scaling=8.0, smoothness_weight=0.0,
        ))

    base = run(events, pol, valid)
    # append garbage padded events with valid=0
    pad = np.zeros((P, B, 8, 4), np.float32)
    pad[..., 1] = 3.0
    pad[..., 2] = 3.0
    ev2 = np.concatenate([events, pad], axis=2)
    po2 = np.concatenate([pol, np.ones((P, B, 8, 2), np.float32)], axis=2)
    va2 = np.concatenate([valid, np.zeros((P, B, 8), np.float32)], axis=2)
    np.testing.assert_allclose(run(ev2, po2, va2), base, rtol=1e-6)
