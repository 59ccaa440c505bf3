"""Validation metrics vs. hand-computed values (loss/flow.py:597-938)."""

import jax.numpy as jnp
import numpy as np

from evflow.loss import metrics as M


def setup_case():
    B, H, W = 1, 4, 4
    flow = np.zeros((B, H, W, 2), np.float32)
    flow[..., 0] = 0.5 / 128.0  # x-flow 0.5 px after scaling
    gt = np.zeros((B, H, W, 2), np.float32)
    gt[..., 0] = 1.0
    mask = np.ones((B, H, W), np.float32)
    # invalidate one pixel via events, another via GT
    mask[0, 0, 0] = 0.0
    gt[0, 1, 1] = 0.0
    dt = np.ones((B,), np.float32)
    return flow, gt, mask, dt


def test_aee_value_and_masking():
    flow, gt, mask, dt = setup_case()
    val, pct, err, m = M.aee(jnp.array(flow), jnp.array(gt), jnp.array(mask),
                             jnp.array(dt), jnp.array(dt), 128.0)
    # converted flow = 0.5 px everywhere; error = |0.5 - 1| = 0.5 on 14 valid px
    assert float(m.sum()) == 14.0
    np.testing.assert_allclose(float(val[0]), 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(pct[0]), 0.0, atol=1e-7)


def test_aee_dt_rescaling():
    flow, gt, mask, _ = setup_case()
    dt_gt = np.array([2.0], np.float32)
    dt_in = np.array([1.0], np.float32)
    val, *_ = M.aee(jnp.array(flow), jnp.array(gt), jnp.array(mask),
                    jnp.array(dt_gt), jnp.array(dt_in), 128.0)
    # flow doubled -> |1.0 - 1.0| = 0
    np.testing.assert_allclose(float(val[0]), 0.0, atol=1e-6)


def test_aee_outliers():
    B, H, W = 1, 2, 2
    flow = np.zeros((B, H, W, 2), np.float32)
    flow[..., 0] = 10.0 / 128.0  # 10 px
    gt = np.full((B, H, W, 2), 1.0, np.float32)
    mask = np.ones((B, H, W), np.float32)
    dt = np.ones((B,), np.float32)
    val, pct, *_ = M.aee(jnp.array(flow), jnp.array(gt), jnp.array(mask),
                         jnp.array(dt), jnp.array(dt), 128.0)
    # error ~ sqrt(81+1) ≈ 9.06 > 3px and > 5% of |flow|=10 -> all outliers
    assert float(pct[0]) == 1.0


def test_aae_reference_quirk():
    """AAE uses cos = (|f||g|)/(dot + 0.01) (loss/flow.py:727)."""
    B, H, W = 1, 1, 1
    f = np.array([[[[3.0 / 128, 4.0 / 128]]]], np.float32)
    g = np.array([[[[4.0, 3.0]]]], np.float32)
    mask = np.ones((B, H, W), np.float32)
    dt = np.ones((B,), np.float32)
    val, pct, err, m = M.aae(jnp.array(f), jnp.array(g), jnp.array(mask),
                             jnp.array(dt), jnp.array(dt), 128.0)
    fn, gn = 5.0, 5.0
    dot = 3 * 4 + 4 * 3
    cos = np.clip((fn * gn) / (dot + 0.01), -1 + 1e-5, 1 - 1e-5)
    np.testing.assert_allclose(float(val[0]), np.arccos(cos), rtol=1e-3)


def test_aae_strict_mode_is_conventional():
    B, H, W = 1, 1, 1
    f = np.array([[[[1.0 / 128, 0.0]]]], np.float32)
    g = np.array([[[[0.0, 1.0]]]], np.float32)  # orthogonal
    mask = np.ones((B, H, W), np.float32)
    dt = np.ones((B,), np.float32)
    val, *_ = M.aae(jnp.array(f), jnp.array(g), jnp.array(mask),
                    jnp.array(dt), jnp.array(dt), 128.0, True)
    np.testing.assert_allclose(float(val[0]), np.pi / 2, rtol=1e-4)


def test_naae_normalizes_by_magnitude():
    B, H, W = 1, 1, 1
    f = np.array([[[[2.0 / 128, 0.0]]]], np.float32)
    g = np.array([[[[0.0, 2.0]]]], np.float32)
    mask = np.ones((B, H, W), np.float32)
    dt = np.ones((B,), np.float32)
    val, *_ = M.naae(jnp.array(f), jnp.array(g), jnp.array(mask),
                     jnp.array(dt), jnp.array(dt), 128.0)
    np.testing.assert_allclose(float(val[0]), (np.pi / 2) / 2.0, rtol=1e-4)


def test_ae_of_means():
    B, H, W = 1, 2, 2
    f = np.zeros((B, H, W, 2), np.float32)
    f[..., 0] = 1.0 / 128
    g = np.zeros((B, H, W, 2), np.float32)
    g[..., 0] = 5.0  # same direction, different magnitude
    mask = np.ones((B, H, W), np.float32)
    dt = np.ones((B,), np.float32)
    val = M.ae_of_means(jnp.array(f), jnp.array(g), jnp.array(mask),
                        jnp.array(dt), jnp.array(dt), 128.0)
    np.testing.assert_allclose(float(val[0]), 0.0, atol=1e-2)


def test_aae_filtered_threshold():
    B, H, W = 1, 1, 2
    f = np.zeros((B, H, W, 2), np.float32)
    f[0, 0, 0, 0] = 0.1 / 128  # below threshold after scaling
    f[0, 0, 1, 0] = 2.0 / 128  # above
    g = np.zeros((B, H, W, 2), np.float32)
    g[..., 1] = 1.0
    mask = np.ones((B, H, W), np.float32)
    dt = np.ones((B,), np.float32)
    val = M.aae_filtered(jnp.array(f), jnp.array(g), jnp.array(mask),
                         jnp.array(dt), jnp.array(dt), 128.0, 0.5)
    # only the second pixel passes the magnitude filter; orthogonal -> pi/2
    np.testing.assert_allclose(float(val[0]), np.pi / 2, rtol=1e-3)


def test_metric_class_api():
    cfg = {"loader": {"resolution": [4, 4]}}
    metric = M.AEE(cfg, flow_scaling=128)
    flow, gt, mask, dt = setup_case()
    inputs = {
        "gtflow": jnp.array(gt),
        "event_mask": jnp.array(mask)[..., None],
        "dt_gt": jnp.array(dt),
        "dt_input": jnp.array(dt),
    }
    metric.event_flow_association([jnp.array(flow)], inputs)
    val, pct = metric()
    np.testing.assert_allclose(float(val[0]), 0.5, rtol=1e-5)
    metric.reset()
    assert metric._flow is None
    # heatmap accumulated
    avg, count = metric.get_final_error_heatmap()
    assert avg is not None and count.sum() == 14.0


def test_masked_window_flow():
    P, B, H, W = 2, 1, 2, 2
    fm = np.zeros((P, B, H, W, 2), np.float32)
    fm[0, ..., 0] = 1.0
    fm[1, ..., 0] = 3.0
    em = np.ones((P, B, H, W, 1), np.float32)
    out = M.compute_masked_window_flow(jnp.array(fm), jnp.array(em))
    np.testing.assert_allclose(np.asarray(out[..., 0]), 2.0, rtol=1e-5)


def test_window_events_counts():
    B, N = 1, 6
    events = np.zeros((B, N, 4), np.float32)
    events[0, :, 1] = [0, 0, 1, 1, 2, 3]
    events[0, :, 2] = [0, 1, 0, 1, 2, 3]
    pol = np.stack([np.ones((B, N)), np.zeros((B, N))], -1).astype(np.float32)
    valid = np.ones((B, N), np.float32)
    out = M.compute_window_events(jnp.array(events), jnp.array(pol), jnp.array(valid), (4, 4))
    assert out.shape == (B, 4, 4, 2)
    assert float(np.asarray(out).sum()) == 6.0


def test_heatmap_accumulates_at_std_resolution():
    """Heatmaps aggregate at std_resolution even when the metric runs at a
    pooled processing resolution (loss/flow.py:330: _std_resolution is the
    heatmap resolution)."""
    cfg = {"loader": {"resolution": [2, 2], "std_resolution": [4, 4]}}
    metric = M.AEE(cfg, flow_scaling=128)
    B, H, W = 1, 2, 2
    flow = np.zeros((B, H, W, 2), np.float32)
    gt = np.ones((B, H, W, 2), np.float32)
    inputs = {
        "gtflow": jnp.array(gt),
        "event_mask": jnp.ones((B, H, W, 1), np.float32),
        "dt_gt": jnp.ones((B,), np.float32),
        "dt_input": jnp.ones((B,), np.float32),
    }
    metric.event_flow_association([jnp.array(flow)], inputs)
    metric()
    avg, count = metric.get_final_error_heatmap()
    assert avg.shape == (4, 4) and count.shape == (4, 4)
    # nearest-upsampled: every pooled pixel covers a 2x2 block
    np.testing.assert_allclose(count, 1.0)
    np.testing.assert_allclose(avg, np.sqrt(2.0), rtol=1e-5)


def test_per_slot_reset_keeps_live_slots():
    """reset(slots=...) clears only rolled-over slots' association — live
    slots keep contributing (B>1 sequence rollover, eval_flow.py:211-214
    generalized)."""
    cfg = {"loader": {"resolution": [2, 2]}}
    metric = M.AEE(cfg, flow_scaling=128)
    B, H, W = 2, 2, 2
    flow = np.zeros((B, H, W, 2), np.float32)
    gt = np.ones((B, H, W, 2), np.float32)
    inputs = {
        "gtflow": jnp.array(gt),
        "event_mask": jnp.ones((B, H, W, 1), np.float32),
        "dt_gt": jnp.ones((B,), np.float32),
        "dt_input": jnp.ones((B,), np.float32),
    }
    metric.event_flow_association([jnp.array(flow)], inputs)
    metric.reset(slots=np.array([True, False]))
    val, pct = metric()
    # slot 0 cleared (no valid pixels -> 0/eps), slot 1 intact
    np.testing.assert_allclose(float(val[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(val[1]), np.sqrt(2.0), rtol=1e-5)
    # full reset still clears everything
    metric.reset()
    assert metric._flow is None
    # reset(slots) before any association is a no-op
    metric.reset(slots=np.array([True, True]))
    assert metric._flow is None
