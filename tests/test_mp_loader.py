"""MPEventStream: multi-process slot-sharded loader (evflow/data/mp_loader.py).

The reference cannot use loader workers at all (stateful per-slot HDF5
cursors force num_workers: 0, reference configs/parser.py:86); evflow's
worker processes each own a slot group + file shard. These tests pin the
sharding contract: each worker's stream is bit-identical to an in-process
H5EventStream over the same shard, and global bookkeeping (epoch_done,
seq_num) follows slowest-shard semantics.
"""

import numpy as np
import pytest

from evflow.data.h5_stream import H5EventStream
from evflow.data.mp_loader import MPEventStream, build_stream
from evflow.data.synthetic import make_dataset

ARRAY_KEYS = (
    "event_cnt", "event_voxel", "event_mask", "event_list",
    "event_list_pol_mask", "event_valid", "dt_input", "new_seq", "ts",
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mp_synth"))
    make_dataset(root, num_sequences=4, resolution=(24, 24),
                 events_per_sec=20_000, duration=0.4, gt_hz=10.0,
                 flows=[(10.0, -5.0), (-8.0, 4.0), (6.0, 6.0), (-4.0, -9.0)])
    return root


def base_cfg(root, batch=4, workers=1, window=600, seed=3):
    return {
        "data": {"path": root, "mode": "events", "window": window},
        "loader": {
            "resolution": [24, 24], "std_resolution": [24, 24],
            "batch_size": batch, "num_workers": workers, "seed": seed,
            "augment": ["Horizontal", "Polarity"], "augment_prob": [0.5, 0.5],
        },
        "hot_filter": {"enabled": False},
        "vis": {"bars": False},
    }


def test_worker_streams_match_sharded_single_process(dataset):
    """MP batches == concat of per-shard in-process streams, bit-exact."""
    mp_stream = MPEventStream(base_cfg(dataset, batch=4, workers=2), 2)

    refs = []
    for w in range(2):
        cfg = base_cfg(dataset, batch=2)
        cfg["loader"].update(num_shards=2, shard_index=w, seed=3 + w)
        del cfg["loader"]["num_workers"]
        refs.append(H5EventStream(cfg, 2))

    try:
        for _ in range(10):
            got = mp_stream.next_batch()
            subs = [r.next_batch() for r in refs]
            n_pad = max(s["event_list"].shape[1] for s in subs)
            for k in ARRAY_KEYS:
                parts = []
                for s in subs:
                    a = s[k]
                    if k in ("event_list", "event_list_pol_mask",
                             "event_valid") and a.shape[1] < n_pad:
                        pad = [(0, 0)] * a.ndim
                        pad[1] = (0, n_pad - a.shape[1])
                        a = np.pad(a, pad)
                    parts.append(a)
                np.testing.assert_array_equal(
                    got[k], np.concatenate(parts, axis=0), err_msg=k)
            assert got["file_names"] == sum(
                (s["file_names"] for s in subs), [])
    finally:
        mp_stream.close()
        for r in refs:
            r.close()


def test_epoch_done_slowest_shard(dataset):
    """epoch_done fires only when EVERY worker's shard has wrapped since
    the last global epoch, and re-arms: replay the two reference shards to
    learn their epoch cadence, then check the MP stream fires exactly when
    the slower one does."""
    cfg = base_cfg(dataset, batch=2, workers=2, window=900)
    s = MPEventStream(cfg, 2)
    refs = []
    for w in range(2):
        rcfg = base_cfg(dataset, batch=1, window=900)
        rcfg["loader"].update(num_shards=2, shard_index=w, seed=3 + w)
        del rcfg["loader"]["num_workers"]
        refs.append(H5EventStream(rcfg, 2))
    try:
        counts = [0, 0]
        emitted = 0
        for _ in range(40):
            got = s.next_batch()
            expect = False
            for w, r in enumerate(refs):
                sub = r.next_batch()
                counts[w] += bool(sub["epoch_done"])
            if min(counts) > emitted:
                emitted = min(counts)
                expect = True
            assert got["epoch_done"] == expect
        assert emitted >= 1  # the cadence was actually exercised
    finally:
        s.close()
        for r in refs:
            r.close()


def test_worker_failure_surfaces(dataset, tmp_path):
    """A worker that dies (dataset vanished between inventory and start)
    raises in the consumer instead of hanging."""
    import shutil

    root = str(tmp_path / "vanishing")
    shutil.copytree(dataset, root)
    s = MPEventStream(base_cfg(root, batch=2, workers=2), 2)
    shutil.rmtree(root)  # workers start lazily on first next_batch
    with pytest.raises((RuntimeError, FileNotFoundError, OSError)):
        s.next_batch()
    s.close()


def test_build_stream_factory(dataset):
    s1 = build_stream(base_cfg(dataset, workers=1), 2)
    assert isinstance(s1, H5EventStream)
    s1.close()
    s2 = build_stream(base_cfg(dataset, batch=2, workers=2), 2)
    assert isinstance(s2, MPEventStream)
    s2.close()


def test_invalid_worker_counts(dataset):
    with pytest.raises(ValueError, match="num_workers"):
        MPEventStream(base_cfg(dataset, batch=2, workers=3), 2)
    with pytest.raises(ValueError, match="num_workers"):
        MPEventStream(base_cfg(dataset, batch=2, workers=0), 2)


def test_train_loop_with_mp_loader(dataset, tmp_path):
    """End-to-end: the train loop runs on an MPEventStream
    (loader.num_workers: 2) — lazy worker start after shuffle(), Prefetcher
    wrapping, per-slot rollover resets, epoch bookkeeping, clean close."""
    import os

    from evflow.train import train

    cfg = {
        "experiment": "mp",
        "data": {"path": dataset, "mode": "events", "window": 250,
                 "window_loss": 500},
        "model": {
            "name": "LIFFireNet_short", "encoding": "cnt",
            "round_encoding": False, "norm_input": False, "num_bins": 2,
            "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
            "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8],
                               "learn_leak": True, "learn_thresh": True,
                               "hard_reset": True},
        },
        "loss": {"flow_regul_weight": 0.001, "clip_grad": 1.0,
                 "overwrite_intermediate": False},
        "optimizer": {"name": "Adam", "lr": 0.0002},
        "loader": {
            "n_epochs": 100, "batch_size": 2, "num_workers": 2,
            "resolution": [24, 24], "std_resolution": [24, 24],
            "augment": [], "augment_prob": [], "seed": 0,
        },
        "vis": {"verbose": False, "enabled": False, "store_grads": False,
                "bars": False},
        "hot_filter": {"enabled": False},
    }
    run = train(cfg, path_runs=str(tmp_path / "runs"), max_steps=3,
                verbose=False)
    assert os.path.exists(os.path.join(run.dir, "params.yaml"))


def test_worker_death_surfaces(dataset):
    """A killed worker process raises within ~1s instead of hanging the
    training loop (SURVEY §5.3 failure surfacing)."""
    cfg = base_cfg(dataset, batch=2, workers=1)
    stream = MPEventStream(cfg, num_bins=2)
    try:
        stream.next_batch()  # workers start lazily
        stream._procs[0].terminate()
        stream._procs[0].join(timeout=10.0)
        with pytest.raises(RuntimeError, match="worker"):
            # drain at most the prefetch depth, then the death must surface
            for _ in range(stream.depth + 3):
                stream.next_batch()
    finally:
        stream.close()
