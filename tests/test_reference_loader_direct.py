"""L2 streaming parity vs the GENUINE reference H5Loader.

The reference's actual ``dataloader/h5.py``/``base.py`` (loaded from
/root/reference with stubs for its unused heavyweight deps: hdf5plugin —
only needed for compressed MVSEC files, torchvision — only the
keep_gt_full_res CenterCrop path, progress — only when vis.bars) streams
the SAME synthetic HDF5 files as evflow's ``H5EventStream``, window by
window, and every emitted tensor must match:

  * events mode (fixed-count windows): event_cnt / event_mask /
    event_voxel / event_list / pol_mask, dt_input, sequence rollover
    position and the new_seq flag;
  * gtflow_dt1 mode (GT-frame windows): everything above + gtflow and
    dt_gt;
  * time mode (fixed-seconds windows): per-window event slices via the
    reference's recursive binary search vs evflow's searchsorted.

This pins the entire host streaming state machine — window indexing,
±1-ps polarity mapping, min-max ts normalization, encoding kernels,
rollover bookkeeping — against the reference's own code rather than a
re-implementation (round-5 genuine-oracle tier; see
tests/test_reference_direct.py for the L4/L3 layers).

Tolerances: ts-dependent outputs (event_list ts column, voxel weights)
differ at ~1e-6 because the reference normalizes µs-scale stamps in f32
while evflow normalizes in f64 (PARITY.md divergence 9b); everything
else is exact.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not available"
)


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _direct_load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


if os.path.isdir(REF_ROOT):
    # stubs for deps the driven paths never touch
    _stub("hdf5plugin")
    _tv = _stub("torchvision")
    _tv.transforms = _stub("torchvision.transforms")
    _prog = _stub("progress")
    _prog_bar = _stub("progress.bar")

    class _Bar:  # progress.bar.Bar stand-in (vis.bars stays False)
        def __init__(self, *a, **k):
            pass

    _prog_bar.Bar = _Bar

    _pkg = types.ModuleType("refdl")
    _pkg.__path__ = [f"{REF_ROOT}/dataloader"]
    sys.modules.setdefault("refdl", _pkg)
    _direct_load("refdl.encodings", f"{REF_ROOT}/dataloader/encodings.py")
    _direct_load("refdl.utils", f"{REF_ROOT}/dataloader/utils.py")
    _direct_load("refdl.base", f"{REF_ROOT}/dataloader/base.py")
    ref_h5 = _direct_load("refdl.h5", f"{REF_ROOT}/dataloader/h5.py")

from evflow.data.h5_stream import H5EventStream  # noqa: E402
from evflow.data.synthetic import make_dataset  # noqa: E402

H = W = 32


def _config(root, mode, window, encoding="voxel", resolution=None,
            keep_gt_full_res=False):
    """One config dict accepted by BOTH loaders (schemas intentionally
    compatible; see evflow/config.py)."""
    loader = {
        "resolution": list(resolution) if resolution else [H, W],
        "std_resolution": [H, W],
        "batch_size": 1,
        "augment": [],
        "augment_prob": [],
        "seed": 0,
    }
    if keep_gt_full_res:
        loader["keep_gt_full_res"] = True
    return {
        "data": {"path": root, "mode": mode, "window": window},
        "model": {"encoding": encoding},
        "loader": loader,
        "vis": {"bars": False},
        "hot_filter": {"enabled": False},
    }


def _ref_loader(cfg, num_bins=2):
    ldr = ref_h5.H5Loader(cfg, num_bins)
    # os.walk yields files in filesystem order; evflow sorts. Force the
    # reference onto the sorted order so both stream file k as seq k.
    want = sorted(ldr.files)
    if ldr.files != want:
        ldr.files = want
        for b in range(cfg["loader"]["batch_size"]):
            ldr.open_files[b].close()
            import h5py

            ldr.open_files[b] = h5py.File(ldr.files[b], "r")
            ldr.batch_last_ts[b] = (
                ldr.open_files[b]["events/ts"][-1]
                - ldr.open_files[b].attrs["t0"]
            )
            if cfg["data"]["mode"] in ("gtflow_dt1", "gtflow_dt4"):
                fm = ref_h5.FlowMaps()
                ldr.open_files[b][
                    cfg["data"]["mode"].replace("gtflow_", "flow_")
                ].visititems(fm)
                ldr.open_files_flowmaps[b] = fm
    return ldr


def _compare_window(ref_out, mine, i, has_gt=False, check_voxel=True):
    """ref_out: reference __getitem__ dict (NCHW / [4,N] layouts);
    mine: evflow next_batch dict (NHWC / padded [1,N,4])."""
    n = int(mine["event_valid"][0].sum())
    rlist = ref_out["event_list"].numpy()  # [4, N]
    assert rlist.shape[1] == n, f"window {i}: event count {rlist.shape[1]} vs {n}"

    if n:
        el = mine["event_list"][0, :n]  # (ts, ys, xs, ps)
        np.testing.assert_allclose(
            el[:, 0], rlist[0], atol=5e-6, err_msg=f"window {i} ts"
        )
        np.testing.assert_array_equal(el[:, 1], rlist[1], f"window {i} ys")
        np.testing.assert_array_equal(el[:, 2], rlist[2], f"window {i} xs")
        np.testing.assert_array_equal(el[:, 3], rlist[3], f"window {i} ps")
        rpol = ref_out["event_list_pol_mask"].numpy()  # [2, N]
        np.testing.assert_array_equal(
            mine["event_list_pol_mask"][0, :n], rpol.T, f"window {i} pol"
        )

    np.testing.assert_allclose(
        mine["event_cnt"][0],
        np.moveaxis(ref_out["event_cnt"].numpy(), 0, -1),
        atol=1e-6,
        err_msg=f"window {i} cnt",
    )
    np.testing.assert_allclose(
        mine["event_mask"][0],
        np.moveaxis(ref_out["event_mask"].numpy(), 0, -1),
        atol=1e-6,
        err_msg=f"window {i} mask",
    )
    if check_voxel:
        # voxel weights are linear in the normalized ts, so the f32-vs-f64
        # normalization divergence (PARITY.md 9b, ~1e-6 per event) sums to
        # ~1e-5..1e-4 absolute on pixels accumulating tens of events
        np.testing.assert_allclose(
            mine["event_voxel"][0],
            np.moveaxis(ref_out["event_voxel"].numpy(), 0, -1),
            atol=2e-4,
            err_msg=f"window {i} voxel",
        )
    np.testing.assert_allclose(
        float(mine["dt_input"][0]),
        float(ref_out["dt_input"]),
        rtol=1e-6,
        atol=1e-9,
        err_msg=f"window {i} dt_input",
    )
    if has_gt:
        np.testing.assert_allclose(
            mine["gtflow"][0],
            np.moveaxis(ref_out["gtflow"].numpy(), 0, -1),
            atol=1e-6,
            err_msg=f"window {i} gtflow",
        )
        np.testing.assert_allclose(
            float(mine["dt_gt"][0]),
            float(ref_out["dt_gt"]),
            rtol=1e-6,
            atol=1e-9,
            err_msg=f"window {i} dt_gt",
        )


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdl"))
    make_dataset(
        root,
        num_sequences=2,
        resolution=(H, W),
        events_per_sec=20_000,
        duration=1.0,
        flows=[(9.0, -6.0), (-7.0, 11.0)],
        gt_hz=10.0,
        seed=3,
    )
    return root


def test_events_mode_direct(dataset):
    """Fixed-count windows across a sequence rollover: the genuine
    H5Loader (h5.py:184-447) and H5EventStream emit identical windows,
    including the rollover position and the new_seq flag."""
    cfg = _config(dataset, "events", 1000)
    ref = _ref_loader(cfg)
    mine = H5EventStream(cfg, num_bins=2)

    rollovers = 0
    # 2 files x 20k events -> 20 windows each; 45 iterations cross both
    for i in range(45):
        ref.new_seq = False
        ref_out = ref[i]
        got = mine.next_batch()
        assert bool(got["new_seq"][0]) == bool(ref.new_seq), f"window {i}"
        rollovers += bool(ref.new_seq)
        _compare_window(ref_out, got, i)
    assert rollovers >= 2, "test must cross sequence boundaries"
    mine.close()


def test_gtflow_mode_direct(dataset):
    """GT-frame windows: gtflow + dt_gt + per-window event slices match
    the genuine loader (h5.py:350-362 GT read, :165-171 indexing)."""
    cfg = _config(dataset, "gtflow_dt1", 1)
    ref = _ref_loader(cfg)
    mine = H5EventStream(cfg, num_bins=2)

    rollovers = 0
    for i in range(22):  # 2 files x 9 usable GT frames + rollovers
        ref.new_seq = False
        ref_out = ref[i]
        got = mine.next_batch()
        assert bool(got["new_seq"][0]) == bool(ref.new_seq), f"window {i}"
        rollovers += bool(ref.new_seq)
        _compare_window(ref_out, got, i, has_gt=True)
    assert rollovers >= 2
    mine.close()


def test_time_mode_direct(dataset):
    """Fixed-seconds windows: the reference's recursive binary search
    (encodings.py:9-27) and evflow's searchsorted must cut identical
    event slices."""
    cfg = _config(dataset, "time", 0.05)
    ref = _ref_loader(cfg)
    mine = H5EventStream(cfg, num_bins=2)

    rollovers = 0
    for i in range(42):  # ~19 windows per 1 s file at 0.05 s
        ref.new_seq = False
        ref_out = ref[i]
        got = mine.next_batch()
        assert bool(got["new_seq"][0]) == bool(ref.new_seq), f"window {i}"
        rollovers += bool(ref.new_seq)
        _compare_window(ref_out, got, i)
    assert rollovers >= 2
    mine.close()


def test_sparse_time_windows_direct(tmp_path):
    """The <=10-events-per-window rule (h5.py:246-251: very sparse windows
    are emptied before encoding) and empty-window encodings match the
    genuine loader on a nearly-event-free stream (time mode)."""
    root = str(tmp_path / "sparse")
    make_dataset(root, num_sequences=1, resolution=(H, W),
                 events_per_sec=150, duration=1.0, flows=[(5.0, -3.0)],
                 gt_hz=10.0, seed=5)
    cfg = _config(root, "time", 0.05)
    ref = _ref_loader(cfg)
    mine = H5EventStream(cfg, num_bins=2)

    empties = 0
    for i in range(30):
        ref.new_seq = False
        ref_out = ref[i]
        got = mine.next_batch()
        assert bool(got["new_seq"][0]) == bool(ref.new_seq), f"window {i}"
        n_ref = ref_out["event_list"].shape[1]
        empties += n_ref == 0
        _compare_window(ref_out, got, i)
    # ~7.5 events/window on average -> the <=10 rule must fire repeatedly
    assert empties >= 5, f"sparse stream produced only {empties} empty windows"
    mine.close()


def test_hot_filter_direct(dataset):
    """The stateful hot-pixel filter (base.py:237-256 create_hot_mask +
    h5.py:327-333 application to cnt/voxel/mask but NOT event_list)
    accumulates identically across windows in both loaders."""
    cfg = _config(dataset, "events", 800)
    cfg["hot_filter"] = {
        "enabled": True, "max_px": 30, "min_obvs": 2, "max_rate": 0.3,
    }
    ref = _ref_loader(cfg)
    mine = H5EventStream(cfg, num_bins=2)

    filtered = 0
    for i in range(12):
        ref.new_seq = False
        ref_out = ref[i]
        got = mine.next_batch()
        _compare_window(ref_out, got, i)
        # the filter must actually be zeroing pixels for this to test it:
        # count-image zeros at pixels the (unfiltered) event list hits
        n = int(got["event_valid"][0].sum())
        el = got["event_list"][0, :n]
        cnt_sum = got["event_cnt"][0].sum(-1)
        hits = cnt_sum[el[:, 1].astype(int), el[:, 2].astype(int)]
        filtered += int((hits == 0).sum() > 0)
    assert filtered >= 5, "hot filter never zeroed a pixel — test is vacuous"
    mine.close()


def test_frames_mode_direct(tmp_path):
    """APS frames windows: the image pair read + window indexing
    (h5.py:336-347) matches the genuine loader."""
    root = str(tmp_path / "frames")
    make_dataset(root, num_sequences=1, resolution=(H, W),
                 events_per_sec=20_000, duration=1.0, flows=[(9.0, -6.0)],
                 gt_hz=10.0, seed=7, with_frames=True)
    cfg = _config(root, "frames", 1)
    ref = _ref_loader(cfg)
    mine = H5EventStream(cfg, num_bins=2)

    for i in range(8):
        ref.new_seq = False
        ref_out = ref[i]
        got = mine.next_batch()
        assert bool(got["new_seq"][0]) == bool(ref.new_seq), f"window {i}"
        _compare_window(ref_out, got, i)
        rfr = ref_out["frames"].numpy()  # [2, H, W] uint8
        np.testing.assert_array_equal(
            got["frames"][0], np.moveaxis(rfr, 0, -1), f"window {i} frames"
        )
    mine.close()


def test_events_spatial_filter_direct(dataset):
    """Events mode at resolution < std_resolution: the center-crop
    chunk-growing spatial sampler (h5.py:449-545) — exact event sets,
    shifted coordinates, and the quirky double cursor advance
    (batch_row set to the search stop THEN advanced by window)."""
    cfg = _config(dataset, "events", 400, resolution=(16, 16))
    ref = _ref_loader(cfg)
    mine = H5EventStream(cfg, num_bins=2)

    for i in range(10):
        ref.new_seq = False
        ref_out = ref[i]
        got = mine.next_batch()
        assert bool(got["new_seq"][0]) == bool(ref.new_seq), f"window {i}"
        _compare_window(ref_out, got, i)
        assert mine.batch_row[0] == ref.batch_row[0], f"window {i} cursor"
    mine.close()


@pytest.mark.parametrize("keep_full", [False, True])
def test_gtflow_downsample_direct(dataset, keep_full):
    """gtflow mode at resolution < std_resolution: avg-pooled encodings,
    event-coordinate rescale + clamp, pooled (or kept-full-res) GT flow
    and event mask (h5.py:374-430 + the keep_gt_full_res path) — the
    reference's published multi-resolution operating points."""
    cfg = _config(dataset, "gtflow_dt1", 1, resolution=(16, 16),
                  keep_gt_full_res=keep_full)
    ref = _ref_loader(cfg)
    mine = H5EventStream(cfg, num_bins=2)

    for i in range(8):
        ref.new_seq = False
        ref_out = ref[i]
        got = mine.next_batch()
        assert bool(got["new_seq"][0]) == bool(ref.new_seq), f"window {i}"
        _compare_window(ref_out, got, i, has_gt=True)
        # shape assertions make the operating point explicit
        exp_mask = (H, W, 1) if keep_full else (16, 16, 1)
        exp_gt = (H, W, 2) if keep_full else (16, 16, 2)
        assert got["event_mask"][0].shape == exp_mask
        assert got["gtflow"][0].shape == exp_gt
        assert got["event_cnt"][0].shape == (16, 16, 2)
    mine.close()


def test_augmented_stream_direct(dataset):
    """Augmentation INTEGRATED into streaming (not just the pure
    functions): with augment_prob = 1.0 both loaders deterministically
    flip every window — events H/V/polarity (base.py:101-127) and the
    GT flow map flip + component negation (base.py:144-159) must match
    through the full gtflow pipeline."""
    cfg = _config(dataset, "gtflow_dt1", 1)
    cfg["loader"]["augment"] = ["Horizontal", "Vertical", "Polarity"]
    cfg["loader"]["augment_prob"] = [1.0, 1.0, 1.0]
    ref = _ref_loader(cfg)
    mine = H5EventStream(cfg, num_bins=2)

    for i in range(8):
        ref.new_seq = False
        ref_out = ref[i]
        got = mine.next_batch()
        assert bool(got["new_seq"][0]) == bool(ref.new_seq), f"window {i}"
        _compare_window(ref_out, got, i, has_gt=True)
    mine.close()


def test_multi_slot_direct(dataset):
    """B=2: per-slot file assignment and independent cursors
    (h5.py:53-70 batch slot memory) — slot b's k-th window from the
    genuine loader (``ref[B*k + b]``) equals slot b of evflow's k-th
    batch, across a rollover."""
    cfg = _config(dataset, "events", 1000)
    cfg["loader"]["batch_size"] = 2
    ref = _ref_loader(cfg)
    mine = H5EventStream(cfg, num_bins=2)

    idx = 0
    for k in range(24):
        got = mine.next_batch()
        for b in range(2):
            ref.new_seq = False
            ref_out = ref[idx]
            idx += 1
            n = int(got["event_valid"][b].sum())
            rlist = ref_out["event_list"].numpy()
            assert rlist.shape[1] == n, f"batch {k} slot {b}"
            if n:
                np.testing.assert_array_equal(
                    got["event_list"][b, :n, 1:],
                    rlist[1:].T,
                    f"batch {k} slot {b} events",
                )
            np.testing.assert_allclose(
                got["event_cnt"][b],
                np.moveaxis(ref_out["event_cnt"].numpy(), 0, -1),
                atol=1e-6,
                err_msg=f"batch {k} slot {b} cnt",
            )
    mine.close()


def test_fractional_gtflow_window_direct(dataset):
    """window < 1 GT frame: the fractional index interpolation
    (h5.py:165-171 + :221-237) — the dt4-style operating point — matches."""
    cfg = _config(dataset, "gtflow_dt1", 0.5)
    ref = _ref_loader(cfg)
    mine = H5EventStream(cfg, num_bins=2)

    for i in range(12):
        ref.new_seq = False
        ref_out = ref[i]
        got = mine.next_batch()
        assert bool(got["new_seq"][0]) == bool(ref.new_seq), f"window {i}"
        _compare_window(ref_out, got, i, has_gt=True)
    mine.close()
