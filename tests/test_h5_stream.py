"""H5EventStream: windowing, rollover, augmentation, padding (SURVEY §2 L2)."""

import numpy as np
import pytest

from evflow.data.h5_stream import H5EventStream, Prefetcher, bucket_size
from evflow.data.synthetic import make_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    flows = [(10.0, -5.0), (-8.0, 4.0)]
    make_dataset(root, num_sequences=2, resolution=(32, 32), events_per_sec=20_000,
                 duration=0.5, flows=flows, gt_hz=10.0)
    return root, flows


def events_cfg(root, window=1000, batch=1, res=(32, 32)):
    return {
        "data": {"path": root, "mode": "events", "window": window},
        "loader": {
            "resolution": list(res),
            "std_resolution": list(res),
            "batch_size": batch,
            "augment": [],
            "augment_prob": [],
            "seed": 0,
        },
        "hot_filter": {"enabled": False},
        "vis": {"bars": False},
    }


def gtflow_cfg(root, window=1, batch=1, res=(32, 32)):
    cfg = events_cfg(root, window, batch, res)
    cfg["data"]["mode"] = "gtflow_dt1"
    return cfg


def test_events_mode_fixed_window(dataset):
    root, _ = dataset
    s = H5EventStream(events_cfg(root, window=500), num_bins=2)
    b = s.next_batch()
    assert b["event_list"].shape == (1, 500, 4)
    assert b["event_valid"].sum() == 500
    assert b["event_cnt"].shape == (1, 32, 32, 2)
    assert b["event_voxel"].shape == (1, 32, 32, 2)
    assert b["event_mask"].shape == (1, 32, 32, 1)
    # ts normalized to [0, 1]
    ts = b["event_list"][0, :, 0]
    assert ts.min() >= 0.0 and ts.max() <= 1.0
    # polarity is ±1
    assert set(np.unique(b["event_list"][0, :, 3])) <= {-1.0, 1.0}
    s.close()


def test_event_count_conservation(dataset):
    root, _ = dataset
    s = H5EventStream(events_cfg(root, window=400), num_bins=2)
    b = s.next_batch()
    assert float(b["event_cnt"].sum()) == 400.0
    s.close()


def test_sequence_rollover_and_epoch(dataset):
    root, _ = dataset
    s = H5EventStream(events_cfg(root, window=4000), num_bins=2)
    rollovers = 0
    for _ in range(30):
        b = s.next_batch()
        if b["new_seq"].any():
            rollovers += 1
        if b["epoch_done"]:
            break
    assert rollovers >= 1
    # the boundary batch carries the pre-roll cursor; the stream itself has
    # already rolled over producer-side (prefetch-safe epoch semantics)
    assert b["seq_num"] >= 2
    assert b["epoch_done"] and s.seq_num == b["seq_num"] % 2
    s.close()


def test_gtflow_mode(dataset):
    root, flows = dataset
    s = H5EventStream(gtflow_cfg(root), num_bins=2)
    b = s.next_batch()
    assert "gtflow" in b
    assert b["gtflow"].shape == (1, 32, 32, 2)
    # synthetic GT is constant (vx, vy)*dt with dt=0.1s
    vx, vy = flows[0]
    np.testing.assert_allclose(b["gtflow"][0, 0, 0], [vx * 0.1, vy * 0.1], rtol=1e-5)
    assert b["dt_gt"][0] > 0
    assert b["dt_input"][0] > 0
    s.close()


def test_gtflow_padding_bucketed(dataset):
    root, _ = dataset
    s = H5EventStream(gtflow_cfg(root), num_bins=2)
    b = s.next_batch()
    n = b["event_list"].shape[1]
    assert n == bucket_size(int(b["event_valid"].sum()))
    s.close()


def test_batch_slots_stream_different_files(dataset):
    root, _ = dataset
    s = H5EventStream(events_cfg(root, window=500, batch=2), num_bins=2)
    assert s.batch_idx == [0, 1]
    b = s.next_batch()
    assert b["event_cnt"].shape[0] == 2
    s.close()


def test_horizontal_flip_augmentation(dataset):
    root, _ = dataset
    cfg = events_cfg(root, window=500)
    cfg["loader"]["augment"] = ["Horizontal"]
    cfg["loader"]["augment_prob"] = [1.0]
    s = H5EventStream(cfg, num_bins=2)
    b = s.next_batch()

    cfg2 = events_cfg(root, window=500)
    s2 = H5EventStream(cfg2, num_bins=2)
    b2 = s2.next_batch()
    # flip acts on raw float coords: x' = W - 1 - x (dataloader/base.py:115-117)
    np.testing.assert_allclose(
        b["event_list"][0, :, 2], 31.0 - b2["event_list"][0, :, 2], atol=1e-5
    )
    np.testing.assert_allclose(b["event_list"][0, :, 1], b2["event_list"][0, :, 1])
    s.close(); s2.close()


def test_polarity_flip_augmentation(dataset):
    root, _ = dataset
    cfg = events_cfg(root, window=500)
    cfg["loader"]["augment"] = ["Polarity"]
    cfg["loader"]["augment_prob"] = [1.0]
    s = H5EventStream(cfg, num_bins=2)
    b = s.next_batch()
    s2 = H5EventStream(events_cfg(root, window=500), num_bins=2)
    b2 = s2.next_batch()
    # polarity channels swap
    np.testing.assert_allclose(b["event_cnt"][0, ..., 0], b2["event_cnt"][0, ..., 1], atol=1e-5)
    s.close(); s2.close()


def test_downsample_path(dataset):
    root, _ = dataset
    cfg = gtflow_cfg(root, res=(16, 16))
    cfg["loader"]["std_resolution"] = [32, 32]
    s = H5EventStream(cfg, num_bins=2)
    b = s.next_batch()
    assert b["event_cnt"].shape == (1, 16, 16, 2)
    assert b["gtflow"].shape == (1, 16, 16, 2)
    assert b["event_mask"].shape == (1, 16, 16, 1)
    el = b["event_list"][b["event_valid"].astype(bool)]
    assert el[:, 1].max() <= 15 and el[:, 2].max() <= 15
    s.close()


def test_keep_gt_full_res(dataset):
    root, _ = dataset
    cfg = gtflow_cfg(root, res=(16, 16))
    cfg["loader"]["std_resolution"] = [32, 32]
    cfg["loader"]["keep_gt_full_res"] = True
    s = H5EventStream(cfg, num_bins=2)
    b = s.next_batch()
    assert b["event_cnt"].shape == (1, 16, 16, 2)
    assert b["gtflow"].shape == (1, 32, 32, 2)   # GT stays full res
    assert b["event_mask"].shape == (1, 32, 32, 1)  # mask stays full res
    s.close()


def test_hot_filter_state(dataset):
    root, _ = dataset
    cfg = events_cfg(root, window=500)
    cfg["hot_filter"] = {"enabled": True, "max_px": 10, "min_obvs": 1, "max_rate": 0.8}
    s = H5EventStream(cfg, num_bins=2)
    for _ in range(4):
        b = s.next_batch()
    assert s.hot_idx[0] == 4
    s.close()


def test_prefetcher(dataset):
    root, _ = dataset
    s = H5EventStream(events_cfg(root, window=500), num_bins=2)
    pf = Prefetcher(s)
    b1 = next(pf)
    b2 = next(pf)
    assert b1["event_cnt"].shape == b2["event_cnt"].shape
    pf.close()
    s.close()


def test_spatial_filter_events_mode(dataset):
    root, _ = dataset
    cfg = events_cfg(root, window=300, res=(16, 16))
    cfg["loader"]["std_resolution"] = [32, 32]
    s = H5EventStream(cfg, num_bins=2)
    b = s.next_batch()
    el = b["event_list"][b["event_valid"].astype(bool)]
    assert el.shape[0] == 300
    assert el[:, 1].max() < 16 and el[:, 2].max() < 16
    s.close()


def test_get_iters(dataset):
    root, _ = dataset
    s = H5EventStream(gtflow_cfg(root), num_bins=2)
    assert s.get_iters(0) == 5  # 6 GT frames over 0.5 s at 10 Hz -> 5 windows
    s.close()


def test_time_mode(dataset):
    root, _ = dataset
    cfg = events_cfg(root)
    cfg["data"] = {"path": root, "mode": "time", "window": 0.05}
    s = H5EventStream(cfg, num_bins=2)
    b = s.next_batch()
    n = int(b["event_valid"].sum())
    # 20k events/s * 0.05 s ~ 1000 events
    assert 500 < n < 2000
    # duration of the window ~ 0.05 s
    assert 0.03 < float(b["dt_input"][0]) < 0.07
    s.close()


def test_frames_mode(tmp_path):
    from evflow.data.synthetic import make_dataset as mk

    root = str(tmp_path / "frames")
    mk(root, num_sequences=1, resolution=(32, 32), events_per_sec=20_000,
       duration=0.5, flows=[(10.0, -5.0)], gt_hz=10.0, with_frames=True)
    cfg = events_cfg(root)
    cfg["data"] = {"path": root, "mode": "frames", "window": 1}
    s = H5EventStream(cfg, num_bins=2)
    b = s.next_batch()
    assert "frames" in b
    assert b["frames"].shape == (1, 32, 32, 2)
    s.close()


def test_gtflow_fractional_window_dt4(dataset):
    """window=0.25 sub-frame windows (the dt4 protocol, h5.py:220-237)."""
    root, _ = dataset
    cfg = gtflow_cfg(root)
    cfg["data"]["mode"] = "gtflow_dt4"
    cfg["data"]["window"] = 0.25
    s = H5EventStream(cfg, num_bins=2)
    ns = []
    for _ in range(4):
        b = s.next_batch()
        ns.append(int(b["event_valid"].sum()))
        assert "gtflow" in b
    # four quarter-windows hold ~1/4 of a frame window each
    assert all(n > 50 for n in ns)
    assert s.batch_row[0] == 1.0
    s.close()


def test_multihost_file_sharding(dataset):
    """Each host streams its own round-robin shard of the sequence files
    (SURVEY §5.8: the multi-process analog of per-slot file assignment)."""
    root, _ = dataset
    cfg0 = events_cfg(root, window=500)
    cfg0["loader"].update(num_shards=2, shard_index=0)
    cfg1 = events_cfg(root, window=500)
    cfg1["loader"].update(num_shards=2, shard_index=1)
    s0 = H5EventStream(cfg0, num_bins=2)
    s1 = H5EventStream(cfg1, num_bins=2)
    assert set(s0.files).isdisjoint(s1.files)
    assert len(s0.files) + len(s1.files) == 2
    b0, b1 = s0.next_batch(), s1.next_batch()
    assert b0["file_names"][0] != b1["file_names"][0]
    s0.close(); s1.close()

    # more shards than files is an explicit error, not silent starvation
    cfg_bad = events_cfg(root, window=500)
    cfg_bad["loader"].update(num_shards=5, shard_index=4)
    with pytest.raises(ValueError):
        H5EventStream(cfg_bad, num_bins=2)


def test_window_larger_than_all_files_raises(dataset):
    """If no sequence can produce one window, next_batch raises instead of
    spinning through the file ring forever."""
    root, _ = dataset
    s = H5EventStream(events_cfg(root, window=10_000_000), num_bins=2)
    with pytest.raises(ValueError, match="shorter than one window"):
        s.next_batch()
    s.close()


def test_prefetcher_dead_worker_raises(dataset):
    """After the worker dies on an exception, further next() calls raise
    instead of blocking forever on an unfed queue."""
    from evflow.data.h5_stream import Prefetcher

    root, _ = dataset
    s = H5EventStream(events_cfg(root, window=10_000_000), num_bins=2)
    fetch = Prefetcher(s, depth=2)
    with pytest.raises(ValueError):
        next(fetch)
    with pytest.raises(RuntimeError, match="prefetch worker died"):
        next(fetch)
    fetch.close()
    s.close()


def test_fetch_workers_identical_stream(dataset):
    """loader.fetch_workers > 1 fans slot fetches over a thread pool and
    (with augmentation off) produces byte-identical batches to the
    sequential path across sequence rollovers."""
    root, _ = dataset
    cfg1 = events_cfg(root, window=300, batch=2)
    cfg2 = events_cfg(root, window=300, batch=2)
    cfg2["loader"]["fetch_workers"] = 2
    s1 = H5EventStream(cfg1, num_bins=2)
    s2 = H5EventStream(cfg2, num_bins=2)
    for _ in range(12):
        b1 = s1.next_batch()
        b2 = s2.next_batch()
        assert b1["epoch_done"] == b2["epoch_done"]
        if b1["epoch_done"]:
            break
        for k in ("event_cnt", "event_voxel", "event_mask", "event_list",
                  "event_valid", "new_seq"):
            np.testing.assert_array_equal(np.asarray(b1[k]), np.asarray(b2[k]), err_msg=k)
    s1.close()
    s2.close()


def test_per_slot_ts_provenance(dataset):
    """batch["ts"] is a [B] array of per-slot last event timestamps: at B>1
    each slot streams a different file, and time-based consumers (the vis
    store_interval throttle) must follow the rendered slot's own stream time
    (reference visualization.py:226-231 at B=1, generalized)."""
    root, _ = dataset
    s = H5EventStream(events_cfg(root, window=400, batch=2), num_bins=2)
    b1 = s.next_batch()
    ts1 = np.asarray(b1["ts"])
    assert ts1.shape == (2,)
    assert np.isfinite(ts1).all() and (ts1 > 0).all()
    b2 = s.next_batch()
    ts2 = np.asarray(b2["ts"])
    # each slot's time advances independently with its own stream
    assert (ts2 >= ts1).all() and (ts2 > ts1).any()
    # independent random event times -> the slots are not at the same instant
    assert ts2[0] != ts2[1]
    s.close()


def test_event_cache_identical_stream(dataset):
    """loader.event_cache_bytes caches whole files' pre-cast event arrays;
    batches are identical to the uncached stream across rollovers."""
    root, _ = dataset
    cfg = events_cfg(root, window=700, batch=2)
    cfg["loader"]["event_cache_bytes"] = 1 << 30
    s_cached = H5EventStream(cfg, num_bins=2)
    cfg0 = events_cfg(root, window=700, batch=2)
    cfg0["loader"]["event_cache_bytes"] = 0
    s_plain = H5EventStream(cfg0, num_bins=2)
    for _ in range(12):
        b1, b2 = s_cached.next_batch(), s_plain.next_batch()
        for k in ("event_cnt", "event_voxel", "event_list", "event_valid",
                  "dt_input", "new_seq"):
            np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)
    assert s_cached._ev_cache and s_cached._ev_cache_used > 0
    assert not s_plain._ev_cache
    s_cached.close(); s_plain.close()


def test_event_cache_eviction_budget(dataset):
    """A budget that fits one file but not two evicts FIFO and never
    exceeds the budget."""
    root, _ = dataset
    cfg = events_cfg(root, window=700, batch=1)
    s_probe = H5EventStream(cfg, num_bins=2)
    s_probe.next_batch()
    one_file = next(iter(s_probe._ev_cache.values()))[0]
    s_probe.close()

    cfg2 = events_cfg(root, window=700, batch=2)  # two slots, two files
    cfg2["loader"]["event_cache_bytes"] = int(one_file * 1.5)
    s = H5EventStream(cfg2, num_bins=2)
    for _ in range(6):
        s.next_batch()
        assert s._ev_cache_used <= s.event_cache_bytes
        assert len(s._ev_cache) == 1  # second insert evicted the first
    s.close()


def test_synthetic_motion_rate_mode(tmp_path):
    """rate_mode='motion' emits events proportionally to |flow| (the real
    event-camera property that makes density encode speed); 'fixed' keeps
    the original constant rate."""
    import h5py

    from evflow.data.synthetic import make_dataset

    flows = [(30.0, 0.0), (0.0, 10.0)]  # 3x speed ratio
    fixed = str(tmp_path / "fixed")
    motion = str(tmp_path / "motion")
    make_dataset(fixed, num_sequences=2, flows=flows, events_per_sec=10_000)
    make_dataset(motion, num_sequences=2, flows=flows, events_per_sec=10_000,
                 rate_mode="motion", rate_ref=10.0)

    def counts(root):
        out = []
        for i in range(2):
            with h5py.File(f"{root}/seq_{i:03d}.h5", "r") as f:
                out.append(f["events/ts"].shape[0])
        return out

    cf = counts(fixed)
    assert cf[0] == cf[1] == 10_000
    cm = counts(motion)
    assert cm[0] == 30_000 and cm[1] == 10_000  # rate scales with |v|/ref


def test_compressed_file_filter_error_is_pointed(dataset, monkeypatch):
    """A blosc/zstd-compressed MVSEC file opened without hdf5plugin fails on
    the first data read with h5py's opaque filter OSError; the loader must
    surface the `pip install hdf5plugin` fix (the reference imports the
    plugin unconditionally, dataloader/h5.py:3)."""
    import evflow.data.h5_stream as hs

    root, _ = dataset

    class FilterlessDataset:
        def __getitem__(self, idx):
            raise OSError(
                "Can't read data (can't open directory: required filter "
                "'blosc' is not registered)")

    class FilterlessFile:
        attrs = {"t0": 0.0}

        def __getitem__(self, name):
            return FilterlessDataset()

        def close(self):
            pass

    monkeypatch.setattr(hs, "hdf5plugin", None)
    monkeypatch.setattr(hs.h5py, "File", lambda *a, **k: FilterlessFile())
    with pytest.raises(OSError, match="hdf5plugin"):
        H5EventStream(events_cfg(root, window=500), num_bins=2)
