"""Multi-process event-stream loader: slot-sharded worker processes.

The reference pins ``num_workers: 0`` because its dataset is *stateful* —
per-batch-slot HDF5 cursors (reference ``dataloader/h5.py:53-70``,
``configs/parser.py:86``) would be duplicated, not shared, by torch worker
processes. evflow's per-slot design lifts that limit the same way its
multi-host sharding does (``h5_stream.py:142-168``): batch slots are split
into contiguous groups, each owned by ONE worker process that streams its
own round-robin shard of the sequence files. Workers are full
``H5EventStream`` instances (native fused assembly, event cache, the lot),
so the pipeline scales with host cores instead of being GIL-bound like
``loader.fetch_workers`` threads.

Contract:
  * Worker ``w`` of ``W`` streams file shard ``files[h*W + w :: S*W]`` where
    ``(S, h)`` is the enclosing multi-host shard — intra-host workers
    compose with multi-host sharding by shard refinement.
  * Batches for ``W > 1`` therefore differ from ``W = 1`` in slot→file
    layout (like every sharded loader), but each worker's stream is
    bit-identical to a single-process ``H5EventStream`` over the same
    shard — pinned by ``tests/test_mp_loader.py``.
  * ``epoch_done`` fires when EVERY worker has finished its shard at least
    once since the last global epoch (slowest-shard semantics, so the
    train loop's per-epoch cadence matches the single-process
    ``seq_num >= len(files)`` rule, train_flow.py:121).

Results ride ``multiprocessing`` queues (pickled numpy); queue depth
bounds worker run-ahead. Workers never import jax (explicit shard indices
skip the ``jax.process_count()`` probe), so they stay light and cannot
touch the TPU plugin.
"""

from __future__ import annotations

import copy
import multiprocessing as mp
import os
import queue as queue_mod
from typing import Any, Dict, List, Optional

import numpy as np

from evflow.data.h5_stream import H5EventStream, bucket_size

__all__ = ["MPEventStream", "build_stream"]


def _worker_main(cfg, num_bins, round_encoding, shuffle, out_q, stop_evt):
    """Worker process body: own H5EventStream over the worker's file shard,
    producing batches until told to stop. Exceptions are shipped to the
    parent (Prefetcher-style failure surfacing, h5_stream.py:838-845)."""
    try:
        stream = H5EventStream(cfg, num_bins, round_encoding)
        if shuffle:
            stream.shuffle()
        while not stop_evt.is_set():
            batch = stream.next_batch()
            # the parent re-derives global bookkeeping; ship the local view
            while not stop_evt.is_set():
                try:
                    out_q.put(batch, timeout=0.1)
                    break
                except queue_mod.Full:
                    continue
    except Exception as e:  # pragma: no cover - exercised via parent raise
        try:
            out_q.put(e)
        except Exception:
            pass
    finally:
        try:
            stream.close()
        except Exception:
            pass


class MPEventStream:
    """Drop-in ``H5EventStream`` replacement fanning batch slots over
    ``loader.num_workers`` processes (see module docstring for the
    sharding contract). Exposes the attribute surface the train/eval
    loops consume: ``batch_size``, ``files``, ``epoch``, ``samples``,
    ``seq_num``, ``next_batch``, ``end_epoch``, ``shuffle``, ``close``.
    """

    def __init__(self, config: Dict[str, Any], num_bins: int,
                 round_encoding: bool = False, depth: int = 2):
        loader = config["loader"]
        self.batch_size = int(loader.get("batch_size", 1))
        self.num_workers = int(loader.get("num_workers", 1))
        if not (1 <= self.num_workers <= self.batch_size):
            raise ValueError(
                f"loader.num_workers must be in [1, batch_size]: "
                f"{self.num_workers} vs B={self.batch_size}"
            )
        self.mode = config["data"]["mode"]
        self.window = config["data"]["window"]
        self.depth = int(depth)

        # enclosing multi-host shard (h5_stream.py:147-158 semantics)
        num_shards = loader.get("num_shards")
        shard_index = loader.get("shard_index")
        if num_shards is None or shard_index is None:
            try:
                import jax

                num_shards = jax.process_count()
                shard_index = jax.process_index()
            except Exception:
                num_shards, shard_index = 1, 0

        # full inventory for progress displays (len(data.files) in the
        # train loop); workers re-walk and shard themselves
        self.files: List[str] = []
        for root, _dirs, files in os.walk(config["data"]["path"]):
            for f in sorted(files):
                if f.endswith(".h5"):
                    self.files.append(os.path.join(root, f))
        if not self.files:
            raise FileNotFoundError(
                f"No .h5 files under {config['data']['path']}")

        W = self.num_workers
        base, rem = divmod(self.batch_size, W)
        self._slot_counts = [base + (1 if w < rem else 0) for w in range(W)]
        self._worker_cfgs = []
        for w in range(W):
            cfg = copy.deepcopy(config)
            cfg["loader"]["batch_size"] = self._slot_counts[w]
            # shard refinement: host shard h of S splits W ways
            cfg["loader"]["num_shards"] = int(num_shards) * W
            cfg["loader"]["shard_index"] = int(shard_index) * W + w
            # distinct augmentation draws per worker, deterministic in W
            cfg["loader"]["seed"] = int(loader.get("seed", 0)) + w
            cfg["loader"].pop("num_workers", None)
            self._worker_cfgs.append(cfg)

        self._num_bins = num_bins
        self._round_encoding = round_encoding
        self._shuffle = False
        self._ctx = mp.get_context("spawn")
        self._procs: List[mp.Process] = []
        self._queues = []
        self._stop = None
        self._dead: Optional[Exception] = None

        # global bookkeeping mirrored from worker batches
        self.epoch = 0
        self.samples = 0
        self.seq_num = 0
        self._epoch_counts = [0] * W  # completed shard-epochs per worker
        self._epochs_emitted = 0

    # -- lifecycle ---------------------------------------------------------

    def _start(self):
        self._stop = self._ctx.Event()
        for w in range(self.num_workers):
            q = self._ctx.Queue(maxsize=self.depth)
            p = self._ctx.Process(
                target=_worker_main,
                args=(self._worker_cfgs[w], self._num_bins,
                      self._round_encoding, self._shuffle, q, self._stop),
                daemon=True,
            )
            p.start()
            self._queues.append(q)
            self._procs.append(p)

    def shuffle(self, flag: bool = True):
        """Shuffle each worker's file shard (must precede the first batch —
        workers start lazily on the first ``next_batch``)."""
        if self._procs:
            raise RuntimeError("shuffle() must be called before streaming")
        self._shuffle = bool(flag)

    # -- batching ----------------------------------------------------------

    def _get(self, w: int):
        while True:
            if self._dead is not None:
                raise RuntimeError(
                    f"loader worker died: {self._dead!r}") from self._dead
            try:
                # short poll: a dead worker surfaces within ~1 s instead of
                # stalling a full long timeout (SURVEY §5.3 failure surfacing)
                item = self._queues[w].get(timeout=1.0)
            except queue_mod.Empty:
                alive = self._procs[w].is_alive()
                if not alive:
                    self._dead = RuntimeError(
                        f"worker {w} exited without a batch")
                continue
            if isinstance(item, Exception):
                self._dead = item
                raise item
            return item

    def next_batch(self) -> Dict[str, np.ndarray]:
        """One global batch: per-worker sub-batches concatenated over the
        slot dim, event lists re-padded to the widest worker pad."""
        if not self._procs:
            self._start()
        parts = [self._get(w) for w in range(self.num_workers)]

        n_pad = max(p["event_list"].shape[1] for p in parts)
        if self.mode != "events":
            n_pad = bucket_size(n_pad)
        batch: Dict[str, Any] = {}
        for key in ("event_list", "event_list_pol_mask", "event_valid"):
            widths = {
                "event_list": 4, "event_list_pol_mask": 2, "event_valid": None
            }[key]
            shape = ((self.batch_size, n_pad, widths) if widths
                     else (self.batch_size, n_pad))
            buf = np.zeros(shape, np.float32)
            b0 = 0
            for p in parts:
                arr = p[key]
                buf[b0 : b0 + arr.shape[0], : arr.shape[1]] = arr
                b0 += arr.shape[0]
            batch[key] = buf

        skip = {"event_list", "event_list_pol_mask", "event_valid",
                "epoch_done", "seq_num", "file_names"}
        for key in parts[0]:
            if key in skip or key in batch:
                continue
            batch[key] = np.concatenate([p[key] for p in parts], axis=0)
        batch["file_names"] = [n for p in parts for n in p["file_names"]]

        # slowest-shard epoch semantics (see module docstring)
        for w, p in enumerate(parts):
            if p["epoch_done"]:
                self._epoch_counts[w] += 1
        done = min(self._epoch_counts) > self._epochs_emitted
        if done:
            self._epochs_emitted = min(self._epoch_counts)
        batch["epoch_done"] = done
        self.seq_num = sum(p["seq_num"] for p in parts)
        batch["seq_num"] = self.seq_num
        return batch

    def end_epoch(self):
        self.epoch += 1
        self.samples = 0

    def close(self):
        if self._stop is not None:
            self._stop.set()
        for q in self._queues:
            # drain so workers blocked on put() can observe the stop event
            try:
                while True:
                    q.get_nowait()
            except Exception:
                pass
        for p in self._procs:
            p.join(timeout=5.0)
            if p.is_alive():
                p.terminate()
                p.join(timeout=5.0)
        for q in self._queues:
            q.close()
        self._procs, self._queues = [], []


def build_stream(config: Dict[str, Any], num_bins: int,
                 round_encoding: bool = False):
    """Loader factory: ``loader.num_workers > 1`` selects the multi-process
    slot-sharded stream, else the in-process ``H5EventStream``."""
    if int(config["loader"].get("num_workers", 1)) > 1:
        return MPEventStream(config, num_bins, round_encoding)
    return H5EventStream(config, num_bins, round_encoding)
