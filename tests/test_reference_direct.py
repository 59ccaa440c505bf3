"""Parity vs the GENUINE reference implementation at /root/reference.

Unlike tests/test_reference_parity.py (which checks evflow against
builder-written torch mirrors in tests/_torch_ref.py), every oracle in this
file is the reference's OWN code, imported and executed under the installed
torch (CPU): loss/flow.py (EventWarping + all 7 validation metrics),
utils/iwe.py (warp/splat kernels), dataloader/encodings.py (event encodings,
direct file load to dodge the package __init__'s h5py import), and
models/spiking_util.py (surrogate gradients). Randomized inputs drive both
frameworks; values AND gradients must agree to f32 scatter tolerance.

This is the strongest accuracy evidence obtainable without MVSEC data:
any drift in the loss math, IWE bilinear splat, metric masking/outlier
definitions (including the AAE inverted-ratio quirk, loss/flow.py:727), the
encoding kernels, or the surrogate backward curves fails here against the
actual reference, not a re-implementation of it.

The sigmoid-LIF cell family and the UNet flagship get the same treatment
in tests/test_reference_model_direct.py (inert import stubs; the fp32
path never calls brevitas/snntorch at runtime); only the snn.Leaky-based
family remains mirror-based (tests/test_reference_parity.py) because it
calls snntorch at runtime.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import evflow.data.encodings as enc
import evflow.loss.metrics as metrics
import evflow.ops.iwe as iwe
import evflow.ops.surrogate as surrogate
from evflow.loss.warp_loss import event_warping_loss

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not available"
)

# The reference resolves intra-repo imports (loss/flow.py does
# `from utils.iwe import ...`) through its repo root; appended LAST so the
# repo's own top-level packages keep priority everywhere else.
if os.path.isdir(REF_ROOT) and REF_ROOT not in sys.path:
    sys.path.append(REF_ROOT)


def _direct_load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


if os.path.isdir(REF_ROOT):
    ref_iwe = _direct_load("ref_utils_iwe", f"{REF_ROOT}/utils/iwe.py")
    # dataloader/__init__.py imports h5py/hdf5plugin via h5.py — load the
    # kernels module directly instead of through the package
    ref_enc = _direct_load("ref_encodings", f"{REF_ROOT}/dataloader/encodings.py")
    ref_spk = _direct_load("ref_spiking_util", f"{REF_ROOT}/models/spiking_util.py")
    from loss import flow as ref_flow  # needs REF_ROOT on sys.path

    # dataloader/base.py needs a package context for its relative
    # `from .encodings import ...` — synthesize one around the direct loads
    import types

    _pkg = types.ModuleType("ref_dataloader")
    _pkg.__path__ = [f"{REF_ROOT}/dataloader"]
    sys.modules.setdefault("ref_dataloader", _pkg)
    sys.modules.setdefault("ref_dataloader.encodings", ref_enc)
    ref_base = _direct_load("ref_dataloader.base", f"{REF_ROOT}/dataloader/base.py")

H, W = 16, 16
RES = (H, W)
FLOW_SCALING = float(max(RES))


# ---------------------------------------------------------------------------
# input generators (shared layouts; reference is NCHW / (ts, y, x, p) lists)
# ---------------------------------------------------------------------------

def make_events(rng, B, N, h=H, w=W):
    """[B, N, 4] rows (ts, y, x, p): integer pixel coords, ts in [0, 1)."""
    ts = rng.uniform(0.0, 1.0, (B, N)).astype(np.float32)
    ys = rng.integers(0, h, (B, N)).astype(np.float32)
    xs = rng.integers(0, w, (B, N)).astype(np.float32)
    ps = rng.choice([-1.0, 1.0], (B, N)).astype(np.float32)
    return np.stack([ts, ys, xs, ps], axis=-1)


def pol_mask_of(events):
    ps = events[..., 3]
    return np.stack(
        [(ps > 0).astype(np.float32), (ps < 0).astype(np.float32)], axis=-1
    )


def event_mask_of(events, h=H, w=W):
    """[B, 1, h, w] binary event-presence mask (NCHW, reference layout)."""
    B = events.shape[0]
    m = np.zeros((B, 1, h, w), np.float32)
    for b in range(B):
        m[b, 0, events[b, :, 1].astype(int), events[b, :, 2].astype(int)] = 1.0
    return m


def make_flow_nhwc(rng, B, h=H, w=W, scale=0.2):
    return rng.uniform(-scale, scale, (B, h, w, 2)).astype(np.float32)


def nchw(flow_nhwc):
    """torch NCHW [B, 2, H, W] (channel 0 = x) from NHWC (x, y)."""
    return torch.tensor(np.moveaxis(flow_nhwc, -1, 1))


def evflow_event_flow(flow_nhwc, events):
    """Per-event flow (y, x) — evflow's gather."""
    return iwe.lookup_event_flow(jnp.asarray(flow_nhwc), jnp.asarray(events), RES)


def ref_event_flow(flow_t, events_t, res=RES):
    """The reference's gather block (loss/flow.py:66-81) verbatim."""
    flow_idx = events_t[:, :, 1:3].clone()
    flow_idx[:, :, 0] *= res[1]
    flow_idx = torch.sum(flow_idx, dim=2)
    flow = flow_t.view(flow_t.shape[0], 2, -1)
    fy = torch.gather(flow[:, 1, :], 1, flow_idx.long()).unsqueeze(-1)
    fx = torch.gather(flow[:, 0, :], 1, flow_idx.long()).unsqueeze(-1)
    return torch.cat([fy, fx], dim=2)


# ---------------------------------------------------------------------------
# utils/iwe.py — warp + splat kernels
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("round_idx", [False, True])
@pytest.mark.parametrize("tref", [0.0, 1.0, 3.0])
def test_get_interpolation_direct(rng, round_idx, tref):
    """Warp indices + weights vs utils/iwe.py:20-71 elementwise (corner
    ordering, bilinear weights, OOB purge included)."""
    B, N = 2, 64
    events = make_events(rng, B, N)
    flow_nhwc = make_flow_nhwc(rng, B, scale=0.4)  # pushes some events OOB
    ev_flow = np.asarray(evflow_event_flow(flow_nhwc, events))

    ridx, rw = ref_iwe.get_interpolation(
        torch.tensor(events), torch.tensor(ev_flow), tref, RES, FLOW_SCALING,
        round_idx=round_idx,
    )
    jidx, jw = iwe.get_interpolation(
        jnp.asarray(events), jnp.asarray(ev_flow), tref, RES, FLOW_SCALING,
        round_idx=round_idx,
    )
    np.testing.assert_allclose(
        np.asarray(jw), rw.numpy()[..., 0], rtol=1e-6, atol=1e-6
    )
    riv = rw.numpy()[..., 0] > 0
    np.testing.assert_array_equal(
        np.asarray(jidx)[riv], ridx.numpy()[..., 0].astype(np.int64)[riv]
    )


@pytest.mark.parametrize("use_pol", [False, True])
def test_interpolate_direct(rng, use_pol):
    """Scatter-add image vs utils/iwe.py:74-93."""
    B, M = 2, 96
    lin = rng.integers(0, H * W, (B, M))
    w = rng.uniform(0.0, 1.0, (B, M)).astype(np.float32)
    pol = rng.choice([0.0, 1.0], (B, M)).astype(np.float32) if use_pol else None

    r = ref_iwe.interpolate(
        torch.tensor(lin[..., None]), torch.tensor(w[..., None]), RES,
        polarity_mask=None if pol is None else torch.tensor(pol[..., None]),
    )
    j = iwe.interpolate(
        jnp.asarray(lin, jnp.int32), jnp.asarray(w), RES,
        polarity_mask=None if pol is None else jnp.asarray(pol),
    )
    np.testing.assert_allclose(np.asarray(j), r.numpy()[:, 0], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("round_idx", [True, False])
def test_deblur_events_direct(rng, round_idx):
    """Flow gather + forward warp + splat vs utils/iwe.py:96-130."""
    B, N = 2, 80
    events = make_events(rng, B, N)
    flow_nhwc = make_flow_nhwc(rng, B)
    pol = pol_mask_of(events)[..., 0]  # positive-polarity mask

    r = ref_iwe.deblur_events(
        nchw(flow_nhwc), torch.tensor(events), RES, flow_scaling=FLOW_SCALING,
        round_idx=round_idx, polarity_mask=torch.tensor(pol[..., None]),
    )
    j = iwe.deblur_events(
        jnp.asarray(flow_nhwc), jnp.asarray(events), RES,
        flow_scaling=FLOW_SCALING, round_idx=round_idx,
        polarity_mask=jnp.asarray(pol),
    )
    np.testing.assert_allclose(np.asarray(j), r.numpy()[:, 0], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("round_idx", [True, False])
def test_compute_pol_iwe_direct(rng, round_idx):
    """Per-polarity IWE pair vs utils/iwe.py:133-154."""
    B, N = 2, 80
    events = make_events(rng, B, N)
    flow_nhwc = make_flow_nhwc(rng, B)
    pol = pol_mask_of(events)

    r = ref_iwe.compute_pol_iwe(
        nchw(flow_nhwc), torch.tensor(events), RES,
        torch.tensor(pol[..., 0:1]), torch.tensor(pol[..., 1:2]),
        flow_scaling=FLOW_SCALING, round_idx=round_idx,
    )
    j = iwe.compute_pol_iwe(
        jnp.asarray(flow_nhwc), jnp.asarray(events), RES,
        jnp.asarray(pol[..., 0]), jnp.asarray(pol[..., 1]),
        flow_scaling=FLOW_SCALING, round_idx=round_idx,
    )
    np.testing.assert_allclose(
        np.asarray(j), np.moveaxis(r.numpy(), 1, -1), rtol=1e-5, atol=1e-5
    )


def test_upsample_flow_direct(rng):
    """Nearest-neighbor upsample vs utils/iwe.py:157-176 (2x and 4x)."""
    B = 2
    flow_nhwc = make_flow_nhwc(rng, B, h=8, w=8)
    for f in (2, 4):
        r = ref_iwe.upsample_flow(nchw(flow_nhwc), 8 * f, 8 * f)
        j = iwe.upsample_flow(jnp.asarray(flow_nhwc), 8 * f, 8 * f)
        np.testing.assert_allclose(
            np.asarray(j), np.moveaxis(r.numpy(), 1, -1), rtol=1e-6, atol=0
        )


# ---------------------------------------------------------------------------
# dataloader/encodings.py — event encodings
# ---------------------------------------------------------------------------

def _event_arrays(rng, n=120, h=H, w=W):
    xs = rng.integers(0, w, n).astype(np.float32)
    ys = rng.integers(0, h, n).astype(np.float32)
    ts = np.sort(rng.uniform(0, 1, n)).astype(np.float32)
    ps = rng.choice([-1.0, 1.0], n).astype(np.float32)
    return xs, ys, ts, ps


def test_events_to_image_direct(rng):
    xs, ys, ts, ps = _event_arrays(rng)
    r = ref_enc.events_to_image(
        torch.tensor(xs), torch.tensor(ys), torch.tensor(ps), sensor_size=RES
    )
    j = enc.np_events_to_image(xs, ys, ps, RES)
    np.testing.assert_allclose(j, r.numpy(), rtol=1e-6, atol=1e-6)
    jd = enc.jnp_events_to_image(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ps), RES
    )
    np.testing.assert_allclose(np.asarray(jd), r.numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("num_bins", [2, 5])
@pytest.mark.parametrize("round_ts", [False, True])
def test_events_to_voxel_direct(rng, num_bins, round_ts):
    xs, ys, ts, ps = _event_arrays(rng)
    r = ref_enc.events_to_voxel(
        torch.tensor(xs), torch.tensor(ys), torch.tensor(ts), torch.tensor(ps),
        num_bins, sensor_size=RES, round_ts=round_ts,
    )
    j = enc.np_events_to_voxel(xs, ys, ts, ps, num_bins, RES, round_ts=round_ts)
    np.testing.assert_allclose(
        j, np.moveaxis(r.numpy(), 0, -1), rtol=1e-5, atol=1e-6
    )
    jd = enc.jnp_events_to_voxel(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ts), jnp.asarray(ps),
        num_bins, RES, round_ts=round_ts,
    )
    np.testing.assert_allclose(
        np.asarray(jd), np.moveaxis(r.numpy(), 0, -1), rtol=1e-5, atol=1e-5
    )


def test_events_to_channels_direct(rng):
    xs, ys, ts, ps = _event_arrays(rng)
    r = ref_enc.events_to_channels(
        torch.tensor(xs), torch.tensor(ys), torch.tensor(ps), sensor_size=RES
    )
    j = enc.np_events_to_channels(xs, ys, ps, RES)
    np.testing.assert_allclose(
        j, np.moveaxis(r.numpy(), 0, -1), rtol=1e-6, atol=1e-6
    )
    jd = enc.jnp_events_to_channels(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ps), RES
    )
    np.testing.assert_allclose(
        np.asarray(jd), np.moveaxis(r.numpy(), 0, -1), rtol=1e-5, atol=1e-5
    )


def test_hot_event_mask_direct(rng):
    """Iterative hottest-pixel zeroing vs dataloader/encodings.py:88-103."""
    rate = rng.uniform(0.0, 1.2, (H, W)).astype(np.float32)
    for idx in (3, 10):  # below and above min_obvs
        r = ref_enc.get_hot_event_mask(
            torch.tensor(rate.copy()), idx, max_px=20, min_obvs=5, max_rate=0.8
        )
        j = enc.np_hot_event_mask(
            rate.copy(), idx, max_px=20, min_obvs=5, max_rate=0.8
        )
        np.testing.assert_array_equal(j, r.numpy())


# ---------------------------------------------------------------------------
# models/spiking_util.py — surrogate gradient curves
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "name,thresh,width",
    [
        ("superspike", 1.0, 10.0),
        ("mgspike", 1.0, 0.5),
        ("trianglespike", 1.0, 1.0),
        ("arctanspike", 1.0, 10.0),
        ("arctanspike", 0.3, 4.0),  # non-default hyperparameters
    ],
)
def test_surrogate_direct(name, thresh, width):
    """Forward spikes and backward surrogate curves vs spiking_util.py:96-109
    on a dense grid through the threshold."""
    x = np.linspace(-4.0, 4.0, 801).astype(np.float32)

    xt = torch.tensor(x, requires_grad=True)
    ref_fn = getattr(ref_spk, name)
    yt = ref_fn(xt, torch.tensor(thresh), torch.tensor(width))
    yt.backward(torch.ones_like(yt))

    j_fn = surrogate.spike_fn(name)
    yj, vjp = jax.vjp(lambda v: j_fn(v, thresh, width), jnp.asarray(x))
    (gj,) = vjp(jnp.ones_like(yj))

    np.testing.assert_array_equal(np.asarray(yj), yt.detach().numpy())
    np.testing.assert_allclose(np.asarray(gj), xt.grad.numpy(), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# loss/flow.py — EventWarping training loss (value + gradient)
# ---------------------------------------------------------------------------

def _config(mask_output=False, overwrite=False, weight=0.001):
    return {
        "loader": {"resolution": list(RES)},
        "loss": {"flow_regul_weight": weight, "overwrite_intermediate": overwrite},
        "model": {"mask_output": mask_output},
    }


def _window(rng, P, B, N, n_scales=1):
    events = np.stack([make_events(rng, B, N) for _ in range(P)])  # [P,B,N,4]
    pol = np.stack([pol_mask_of(events[p]) for p in range(P)])
    masks = np.stack([event_mask_of(events[p]) for p in range(P)])  # [P,B,1,H,W]
    flows = [
        np.stack([make_flow_nhwc(rng, B) for _ in range(P)])  # [P,B,H,W,2]
        for _ in range(n_scales)
    ]
    return events, pol, masks, flows


def _ref_loss(cfg, events, pol, masks, flows, overwrite=False, want_grad=False):
    """Drive the genuine EventWarping through P association passes."""
    P = events.shape[0]
    ew = ref_flow.EventWarping(cfg, torch.device("cpu"), flow_scaling=FLOW_SCALING)
    flow_t = [
        [nchw(f[p]).clone().requires_grad_(want_grad) for p in range(P)]
        for f in flows
    ]
    for p in range(P):
        ew.event_flow_association(
            [f[p] for f in flow_t],
            torch.tensor(events[p]).clone(),  # association mutates ts in place
            torch.tensor(pol[p]),
            torch.tensor(masks[p]),
        )
    if overwrite:
        ew.overwrite_intermediate_flow([f[-1] for f in flow_t])
    loss = ew()
    if not want_grad:
        return float(loss.detach())
    loss.backward()
    grads = [
        np.stack([np.moveaxis(f[p].grad.numpy(), 1, -1) for p in range(P)])
        for f in flow_t
    ]
    return float(loss.detach()), grads


def _evflow_loss_fn(cfg, events, pol, masks, overwrite=False):
    P, B = events.shape[:2]
    valid = jnp.ones(events.shape[:3], jnp.float32)
    em = jnp.asarray(np.moveaxis(masks, 2, -1))  # [P,B,H,W,1]

    def fn(flow_stack):  # [S, P, B, H, W, 2]
        return event_warping_loss(
            list(flow_stack),
            jnp.asarray(events), jnp.asarray(pol), em, valid,
            flow_scaling=FLOW_SCALING,
            smoothness_weight=cfg["loss"]["flow_regul_weight"],
            res=RES,
            smoothing_mask=bool(cfg["model"].get("mask_output", False)),
            overwrite_intermediate=overwrite,
        )

    return fn


@pytest.mark.parametrize(
    "mask_output,overwrite,n_scales,P",
    [
        (False, False, 1, 1),
        (False, False, 1, 3),
        (True, False, 1, 3),
        (False, True, 1, 3),
        (True, True, 1, 2),
        (False, False, 2, 2),  # multi-scale prediction averaging
    ],
)
def test_event_warping_value_direct(rng, mask_output, overwrite, n_scales, P):
    """Loss value vs the genuine EventWarping over a multi-pass TBPTT window
    (loss/flow.py:58-303), covering smoothing-mask, overwrite-intermediate and
    multi-scale averaging."""
    B, N = 2, 48
    cfg = _config(mask_output=mask_output, overwrite=overwrite)
    events, pol, masks, flows = _window(rng, P, B, N, n_scales)

    ref_val = _ref_loss(cfg, events, pol, masks, flows, overwrite=overwrite)
    fn = _evflow_loss_fn(cfg, events, pol, masks, overwrite=overwrite)
    j_val = float(fn(jnp.asarray(np.stack(flows))))
    np.testing.assert_allclose(j_val, ref_val, rtol=5e-5)


def test_event_warping_loss_scaling_off_direct(rng):
    """loss_scaling=False path (no active-pixel normalization)."""
    cfg = _config()
    events, pol, masks, flows = _window(rng, 2, 1, 40)
    ew = ref_flow.EventWarping(
        cfg, torch.device("cpu"), flow_scaling=FLOW_SCALING, loss_scaling=False
    )
    for p in range(2):
        ew.event_flow_association(
            [nchw(flows[0][p])],
            torch.tensor(events[p]).clone(),
            torch.tensor(pol[p]),
            torch.tensor(masks[p]),
        )
    ref_val = float(ew().detach())
    valid = jnp.ones(events.shape[:3], jnp.float32)
    j_val = float(
        event_warping_loss(
            [jnp.asarray(flows[0])],
            jnp.asarray(events), jnp.asarray(pol),
            jnp.asarray(np.moveaxis(masks, 2, -1)), valid,
            flow_scaling=FLOW_SCALING, smoothness_weight=0.001, res=RES,
            loss_scaling=False,
        )
    )
    np.testing.assert_allclose(j_val, ref_val, rtol=5e-5)


@pytest.mark.parametrize("mask_output", [False, True])
def test_event_warping_grad_direct(rng, mask_output):
    """d(loss)/d(flow) per TBPTT pass vs genuine-reference autograd
    (loss/flow.py:178-303 backward). This is the gradient the optimizer
    actually consumes — training parity hinges on it."""
    P, B, N = 3, 2, 48
    cfg = _config(mask_output=mask_output)
    events, pol, masks, flows = _window(rng, P, B, N)

    ref_val, ref_grads = _ref_loss(
        cfg, events, pol, masks, flows, want_grad=True
    )
    fn = _evflow_loss_fn(cfg, events, pol, masks)
    stack = jnp.asarray(np.stack(flows))
    j_val, j_grad = jax.value_and_grad(fn)(stack)

    np.testing.assert_allclose(float(j_val), ref_val, rtol=5e-5)
    np.testing.assert_allclose(
        np.asarray(j_grad[0]), ref_grads[0], rtol=5e-4, atol=2e-6
    )


# ---------------------------------------------------------------------------
# loss/flow.py:597-938 — the 7 validation metrics
# ---------------------------------------------------------------------------

def _metric_inputs(rng, B=1, passes=2):
    """Association windows shaped like the eval loop's: events, pol mask,
    event mask, GT flow with a zero-flow (invalid) region, dt pair."""
    windows = []
    for _ in range(passes):
        events = make_events(rng, B, 64)
        flow = make_flow_nhwc(rng, B)
        gtflow = rng.uniform(-2.0, 2.0, (B, H, W, 2)).astype(np.float32)
        gtflow[:, : H // 4] = 0.0  # invalid-GT region exercises the gt mask
        windows.append(
            {
                "events": events,
                "pol": pol_mask_of(events),
                "event_mask": event_mask_of(events),  # [B,1,H,W]
                "flow": flow,
                "gtflow": gtflow,
            }
        )
    dt_input = np.float32(0.0327)
    dt_gt = np.float32(0.2496)
    return windows, dt_input, dt_gt


REF_METRICS = {
    "AEE": ("AEE", True),
    "NEE": ("NEE", True),
    "AAE": ("AAE", True),
    "NAAE": ("NAAE", False),
    "AEofMeans": ("AE_ofMeans", False),
    "AAEWeighted": ("AAE_Weighted", False),
    "AAEFiltered": ("AAE_Filtered", False),
}


@pytest.mark.parametrize("name", sorted(REF_METRICS))
def test_metric_direct(rng, name):
    """Metric value (and outlier fraction where defined) vs the genuine
    reference class, after a 2-pass association (loss/flow.py:339-407) —
    covers the dt_gt/dt_input flow conversion, event ∧ GT-validity masking,
    the AAE inverted-ratio quirk (:727), and the outlier definitions."""
    ref_name, has_pct = REF_METRICS[name]
    windows, dt_input, dt_gt = _metric_inputs(rng)
    cfg = _config()

    rcls = getattr(ref_flow, ref_name)
    rmetric = rcls(cfg, torch.device("cpu"), flow_scaling=FLOW_SCALING)
    for wdw in windows:
        inputs = {
            "event_list": torch.tensor(wdw["events"]),
            "event_list_pol_mask": torch.tensor(wdw["pol"]),
            "event_mask": torch.tensor(wdw["event_mask"]),
            "gtflow": nchw(wdw["gtflow"]),
            "dt_input": torch.tensor([dt_input]),
            "dt_gt": torch.tensor([dt_gt]),
        }
        rmetric.event_flow_association([nchw(wdw["flow"])], inputs)
    rout = rmetric()

    jcls = getattr(metrics, name)
    jmetric = jcls(cfg, flow_scaling=FLOW_SCALING)
    for wdw in windows:
        jmetric.event_flow_association(
            [jnp.asarray(wdw["flow"])],
            {
                "gtflow": jnp.asarray(wdw["gtflow"]),
                "event_mask": jnp.asarray(
                    np.moveaxis(wdw["event_mask"], 1, -1)
                ),
                "dt_input": dt_input,
                "dt_gt": dt_gt,
            },
        )
    jout = jmetric()

    if has_pct:
        rval, rpct = rout
        jval, jpct = jout
        np.testing.assert_allclose(
            np.asarray(jval), rval.numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(jpct).reshape(-1),
            rpct.numpy().reshape(-1),
            rtol=1e-5,
            atol=1e-6,
        )
    else:
        np.testing.assert_allclose(
            np.asarray(jout).reshape(-1),
            rout.detach().numpy().reshape(-1),
            rtol=1e-5,
            atol=1e-6,
        )


# ---------------------------------------------------------------------------
# dataloader/base.py — event formatting + augmentation
# ---------------------------------------------------------------------------

def _base_loader(h_flip, v_flip, p_flip):
    """A BaseDataLoader shell with pinned augmentation flags (skips __init__,
    which opens files); enough state for augment_events/frames/flowmap."""
    obj = ref_base.BaseDataLoader.__new__(ref_base.BaseDataLoader)
    obj.config = {"loader": {"augment": ["Horizontal", "Vertical", "Polarity"]}}
    obj.batch_augmentation = {
        "Horizontal": [h_flip],
        "Vertical": [v_flip],
        "Polarity": [p_flip],
    }
    obj.resolution = list(RES)
    return obj


def test_event_formatting_direct(rng):
    """ps {0,1}→±1 + per-window min-max ts normalization vs the genuine
    BaseDataLoader.event_formatting (base.py:71-99), including the
    degenerate all-equal-timestamp window."""
    n = 64
    xs = rng.integers(0, W, n).astype(np.float64)
    ys = rng.integers(0, H, n).astype(np.float64)
    ts = np.sort(rng.uniform(1e6, 1e6 + 5e4, n))  # raw µs-scale stamps
    ps = rng.choice([0.0, 1.0], n)

    rx, ry, rt, rp = ref_base.BaseDataLoader.event_formatting(xs, ys, ts, ps)

    # evflow's inline equivalent (h5_stream.py:590-605)
    jp = ps.astype(np.float32) * 2.0 - 1.0
    tsn = ts.astype(np.float64)
    span = tsn.max() - tsn.min()
    tsn = (tsn - tsn.min()) / span if span > 0 else np.zeros_like(tsn)

    np.testing.assert_allclose(rx.numpy(), xs.astype(np.float32))
    np.testing.assert_allclose(ry.numpy(), ys.astype(np.float32))
    # the reference casts raw µs-scale stamps to f32 BEFORE normalizing
    # (≈0.06 µs representation error at 1e6 → ≈1e-6 after /span); evflow
    # normalizes in f64 (intentional precision divergence, PARITY.md) —
    # tolerance covers exactly that f32 cancellation error
    np.testing.assert_allclose(rt.numpy(), tsn.astype(np.float32), atol=5e-6)
    np.testing.assert_allclose(rp.numpy(), jp)

    flat = np.full(8, 123.456)
    _, _, rt0, _ = ref_base.BaseDataLoader.event_formatting(xs[:8], ys[:8], flat, ps[:8])
    np.testing.assert_array_equal(rt0.numpy(), np.zeros(8, np.float32))


@pytest.mark.parametrize("h_flip", [False, True])
@pytest.mark.parametrize("v_flip", [False, True])
@pytest.mark.parametrize("p_flip", [False, True])
def test_augment_events_direct(rng, h_flip, v_flip, p_flip):
    """H/V/polarity flips vs the genuine augment_events (base.py:101-127)."""
    n = 40
    xs = torch.tensor(rng.integers(0, W, n).astype(np.float32))
    ys = torch.tensor(rng.integers(0, H, n).astype(np.float32))
    ps = torch.tensor(rng.choice([-1.0, 1.0], n).astype(np.float32))

    loader = _base_loader(h_flip, v_flip, p_flip)
    rx, ry, rp = loader.augment_events(xs.clone(), ys.clone(), ps.clone(), 0)

    # evflow's inline equivalent (h5_stream.py:607-613)
    jx, jy, jp = xs.numpy().copy(), ys.numpy().copy(), ps.numpy().copy()
    if h_flip:
        jx = W - 1 - jx
    if v_flip:
        jy = H - 1 - jy
    if p_flip:
        jp = -jp

    np.testing.assert_array_equal(rx.numpy(), jx)
    np.testing.assert_array_equal(ry.numpy(), jy)
    np.testing.assert_array_equal(rp.numpy(), jp)


@pytest.mark.parametrize("h_flip,v_flip", [(True, False), (False, True), (True, True)])
def test_augment_flowmap_direct(rng, h_flip, v_flip):
    """GT-flow flip + component negation vs augment_flowmap (base.py:144-159)
    and frame flips vs augment_frames (base.py:129-142)."""
    fm = rng.uniform(-1, 1, (2, H, W)).astype(np.float32)  # reference [2,H,W]
    loader = _base_loader(h_flip, v_flip, False)
    r = loader.augment_flowmap(fm.copy(), 0)

    # evflow's inline equivalent (h5_stream.py:708-714), NHWC
    j = np.moveaxis(fm, 0, -1).copy()
    if h_flip:
        j = np.flip(j, 1).copy()
        j[..., 0] *= -1.0
    if v_flip:
        j = np.flip(j, 0).copy()
        j[..., 1] *= -1.0
    np.testing.assert_array_equal(np.moveaxis(np.asarray(r), 0, -1), j)

    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    rimg = loader.augment_frames(img.copy(), 0)
    jimg = img.copy()
    if h_flip:
        jimg = np.flip(jimg, 1)
    if v_flip:
        jimg = np.flip(jimg, 0)
    np.testing.assert_array_equal(np.asarray(rimg), jimg)


def test_metric_overwrite_intermediate_direct(rng):
    """Metric evaluation after overwrite_intermediate_flow
    (loss/flow.py:409-433): the reference rebuilds the flow map AND
    collapses the accumulated event masks to their union — AEE then
    reads the union mask, not the last pass' mask."""
    windows, dt_input, dt_gt = _metric_inputs(rng)
    cfg = _config()

    rmetric = ref_flow.AEE(cfg, torch.device("cpu"), flow_scaling=FLOW_SCALING)
    for wdw in windows:
        inputs = {
            "event_list": torch.tensor(wdw["events"]),
            "event_list_pol_mask": torch.tensor(wdw["pol"]),
            "event_mask": torch.tensor(wdw["event_mask"]),
            "gtflow": nchw(wdw["gtflow"]),
            "dt_input": torch.tensor([dt_input]),
            "dt_gt": torch.tensor([dt_gt]),
        }
        rmetric.event_flow_association([nchw(wdw["flow"])], inputs)
    new_flow = make_flow_nhwc(rng, 1)
    rmetric.overwrite_intermediate_flow([nchw(new_flow)])
    rval, rpct = rmetric()

    jmetric = metrics.AEE(cfg, flow_scaling=FLOW_SCALING)
    for wdw in windows:
        jmetric.event_flow_association(
            [jnp.asarray(wdw["flow"])],
            {
                "gtflow": jnp.asarray(wdw["gtflow"]),
                "event_mask": jnp.asarray(
                    np.moveaxis(wdw["event_mask"], 1, -1)
                ),
                "dt_input": dt_input,
                "dt_gt": dt_gt,
            },
        )
    # reference semantics: overwrite collapses the mask window to the
    # union of all associated passes
    union = np.clip(
        sum(np.moveaxis(w["event_mask"], 1, -1) for w in windows), 0, 1
    )
    jmetric.overwrite_intermediate_flow([jnp.asarray(new_flow)],
                                        event_mask=jnp.asarray(union))
    jval, jpct = jmetric()
    np.testing.assert_allclose(np.asarray(jval), rval.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jpct).reshape(-1),
                               rpct.numpy().reshape(-1), rtol=1e-5, atol=1e-6)


def test_metric_association_gather_direct(rng):
    """The per-event flow gather inside metric association (loss/flow.py:
    355-367) vs evflow's lookup_event_flow — same (y, x) vector per event."""
    B, N = 2, 64
    events = make_events(rng, B, N)
    flow = make_flow_nhwc(rng, B)
    r = ref_event_flow(nchw(flow), torch.tensor(events))
    j = evflow_event_flow(flow, events)
    np.testing.assert_allclose(np.asarray(j), r.numpy(), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("round_idx", [True, False])
def test_window_accumulators_direct(rng, round_idx):
    """The visualization window accumulators on BaseValidationLoss —
    compute_window_events / compute_window_iwe / compute_masked_window_flow
    (loss/flow.py:454-487) — vs evflow's metrics helpers, after a genuine
    single-pass association."""
    B, N = 1, 64
    events = make_events(rng, B, N)
    flow = make_flow_nhwc(rng, B)
    pol = pol_mask_of(events)
    emask = event_mask_of(events)
    cfg = _config()

    rmetric = ref_flow.AEE(cfg, torch.device("cpu"), flow_scaling=FLOW_SCALING)
    inputs = {
        "event_list": torch.tensor(events),
        "event_list_pol_mask": torch.tensor(pol),
        "event_mask": torch.tensor(emask),
        "gtflow": nchw(make_flow_nhwc(rng, B)),
        "dt_input": torch.tensor([0.04]),
        "dt_gt": torch.tensor([0.1]),
    }
    rmetric.event_flow_association([nchw(flow)], inputs)

    valid = jnp.ones((B, N), jnp.float32)
    jev = metrics.compute_window_events(
        jnp.asarray(events), jnp.asarray(pol), valid, RES
    )
    np.testing.assert_allclose(
        np.asarray(jev),
        np.moveaxis(rmetric.compute_window_events().numpy(), 1, -1),
        rtol=1e-5, atol=1e-6,
    )

    jiwe = metrics.compute_window_iwe(
        jnp.asarray(flow), jnp.asarray(events), jnp.asarray(pol), valid,
        RES, FLOW_SCALING, tref=1.0, round_idx=round_idx,
    )
    np.testing.assert_allclose(
        np.asarray(jiwe),
        np.moveaxis(
            rmetric.compute_window_iwe(round_idx=round_idx).numpy(), 1, -1
        ),
        rtol=1e-5, atol=1e-5,
    )

    jflow = metrics.compute_masked_window_flow(
        jnp.asarray(flow)[None],
        jnp.asarray(np.moveaxis(emask, 1, -1))[None],
    )
    np.testing.assert_allclose(
        np.asarray(jflow),
        np.moveaxis(rmetric.compute_masked_window_flow().numpy(), 1, -1),
        rtol=1e-5, atol=1e-6,
    )


# ---------------------------------------------------------------------------
# models/model_util.py — crop/pad geometry
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "width,height,encoders",
    [(240, 180, 4), (346, 260, 4), (33, 17, 3), (64, 64, 4), (31, 97, 2)],
)
def test_crop_parameters_direct(rng, width, height, encoders):
    """CropParameters pad/crop geometry vs the genuine model_util.py:30-79
    on MVSEC-like and awkward odd sizes: identical pad amounts, crop
    indices, and an exact pad→crop roundtrip on the same random image."""
    ref_mu = _direct_load("ref_model_util", f"{REF_ROOT}/models/model_util.py")
    from evflow.models.unet import CropParameters, optimal_crop_size

    rcp = ref_mu.CropParameters(width, height, encoders)
    jcp = CropParameters(width, height, encoders)

    assert optimal_crop_size(height, encoders) == rcp.height_crop_size
    assert optimal_crop_size(width, encoders) == rcp.width_crop_size
    assert (jcp.pad_top, jcp.pad_bottom, jcp.pad_left, jcp.pad_right) == (
        rcp.padding_top, rcp.padding_bottom, rcp.padding_left, rcp.padding_right
    )
    assert (jcp.iy0, jcp.iy1, jcp.ix0, jcp.ix1) == (
        rcp.iy0, rcp.iy1, rcp.ix0, rcp.ix1
    )

    img = rng.normal(0, 1, (1, height, width, 3)).astype(np.float32)
    rpad = rcp.pad(torch.tensor(np.moveaxis(img, -1, 1)))
    jpad = jcp.pad(jnp.asarray(img))
    np.testing.assert_array_equal(
        np.asarray(jpad), np.moveaxis(rpad.numpy(), 1, -1)
    )
    rcropped = rcp.crop(rpad)
    jcropped = jcp.crop(jpad)
    np.testing.assert_array_equal(
        np.asarray(jcropped), np.moveaxis(rcropped.numpy(), 1, -1)
    )
    np.testing.assert_array_equal(np.asarray(jcropped), img)


# ---------------------------------------------------------------------------
# utils/visualization.py — rendering formulas
# ---------------------------------------------------------------------------

def _load_ref_viz():
    return _direct_load("ref_visualization", f"{REF_ROOT}/utils/visualization.py")


def test_flow_to_image_direct(rng):
    """Flow color wheel vs the genuine Visualization.flow_to_image
    (visualization.py:648-709): random fields, a field with true zeros,
    and the uniform-magnitude branch."""
    ref_viz = pytest.importorskip("cv2") and _load_ref_viz()
    import evflow.utils.viz as viz

    cases = []
    f = rng.normal(0, 1.5, (24, 24, 2)).astype(np.float32)
    cases.append(f)
    fz = f.copy()
    fz[:8] = 0.0  # true zeros stay black
    cases.append(fz)
    cases.append(np.full((8, 8, 2), 0.7, np.float32))  # uniform branch
    for i, flow in enumerate(cases):
        r = ref_viz.Visualization.flow_to_image(
            flow[..., 0].astype(float), flow[..., 1].astype(float)
        )
        j = viz.flow_to_image(flow)
        np.testing.assert_array_equal(j, r, f"case {i}")


def test_events_to_image_direct(rng):
    """Green/red event rendering vs the genuine Visualization.events_to_image
    (visualization.py:1036-1084), including pos/neg overlap pixels."""
    ref_viz = pytest.importorskip("cv2") and _load_ref_viz()
    import evflow.utils.viz as viz

    cnt = rng.poisson(0.4, (24, 24, 2)).astype(np.float32)
    cnt[3, 3] = (4.0, 5.0)  # overlap pixel
    r = ref_viz.Visualization.events_to_image(cnt.astype(float))
    j = viz.events_to_image(cnt)
    np.testing.assert_array_equal(j, (255 * r).astype(np.uint8))


def test_error_to_image_direct(rng):
    """Angular-error red gradient vs the genuine Visualization.error_to_image
    (visualization.py:617-645)."""
    ref_viz = pytest.importorskip("cv2") and _load_ref_viz()
    import evflow.utils.viz as viz

    err = rng.uniform(0, np.pi, (16, 16)).astype(np.float32)
    r = ref_viz.Visualization.error_to_image(err)
    j = viz.error_to_image(err, rad_to_deg=True)
    np.testing.assert_array_equal(j, r)


# ---------------------------------------------------------------------------
# configs/parser.py — YAMLParser defaults / merge / combine_entries
# ---------------------------------------------------------------------------

# keys intentionally absent from one side (PARITY.md: no torch device
# selection in evflow; augment_prob default added for schema completeness)
_CFG_IGNORE = {("loader", "gpu"), ("loader", "augment_prob")}


def _strip(cfg, path=()):
    if not isinstance(cfg, dict):
        return cfg
    return {
        k: _strip(v, path + (k,))
        for k, v in cfg.items()
        if path + (k,) not in _CFG_IGNORE
    }


def _load_ref_parser():
    spec = importlib.util.spec_from_file_location(
        "ref_parser", f"{REF_ROOT}/configs/parser.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_yaml_parser_direct(tmp_path):
    """Defaults + YAML overlay + recursive merge vs the genuine YAMLParser
    (configs/parser.py:6-96): both sides produce the same config tree for
    the reference's own schema."""
    import evflow.config as ec

    ref_parser = _load_ref_parser()
    yml = tmp_path / "cfg.yml"
    yml.write_text(
        "data:\n  mode: gtflow_dt1\n  window: 1\n"
        "model:\n  name: LIFFireNet\n  base_num_channels: 32\n"
        "spiking_neuron:\n  leak: [0.0, 1.0]\n"
        "loader:\n  resolution: [128, 128]\n  batch_size: 4\n"
        "hot_filter:\n  enabled: false\n"
    )
    rp = ref_parser.YAMLParser(str(yml))
    ref_cfg = {k: v for k, v in rp.config.items()}
    # the reference applies combine_entries only inside merge_configs;
    # evflow normalizes at load — apply the genuine one for comparison
    ref_parser.YAMLParser.combine_entries(ref_cfg)

    j_cfg = ec.load_config(str(yml))
    assert _strip(j_cfg) == _strip(ref_cfg)


def test_merge_configs_direct(tmp_path):
    """Tracker-params merge (stringified dicts -> config, eval overrides
    training values) vs the genuine merge_configs (parser.py:98-115)."""
    import evflow.config as ec

    ref_parser = _load_ref_parser()
    yml = tmp_path / "eval.yml"
    yml.write_text(
        "data:\n  mode: gtflow_dt1\n  window: 1\n"
        "loader:\n  resolution: [64, 64]\n"
    )
    run_params = {
        "model": "{'name': 'LIFFireNet', 'base_num_channels': 32, "
        "'encoding': 'cnt'}",
        "spiking_neuron": "{'leak': [0.0, 1.0], 'thresh': [0.0, 0.8]}",
        "data": "{'mode': 'events', 'window': 1000}",
        "experiment": "TrainRun",
    }
    rp = ref_parser.YAMLParser(str(yml))
    ref_merged = rp.merge_configs(dict(run_params))

    j_merged = ec.merge_configs(run_params, ec.load_config(str(yml)))
    assert _strip(j_merged) == _strip(ref_merged)
    # the eval-side settings must have overridden the training params
    assert j_merged["data"]["mode"] == "gtflow_dt1"
    assert j_merged["model"]["spiking_neuron"]["leak"] == [0.0, 1.0]
