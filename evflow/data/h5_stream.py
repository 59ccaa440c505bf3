"""Host-side streaming event dataloader over reference-format HDF5 files.

Behavioral reference: dataloader/h5.py (H5Loader :47-545) and
dataloader/base.py (BaseDataLoader :10-316). File schema:
  events/{xs, ys, ts, ps}   — raw event stream (ts absolute; attrs["t0"])
  flow_dt1/..., flow_dt4/... — GT flow datasets, each with attrs["timestamp"]
  images/...                 — APS frames, each with attrs["timestamp"]

Semantics preserved:
  * per-batch-slot open files + cursors: slot i streams file i; on sequence
    end the slot advances to ``max(batch_idx) + 1`` (h5.py:255-283);
  * window modes: 'events' (fixed count), 'time' (seconds),
    'frames' / 'gtflow_dt1' / 'gtflow_dt4' (index windows with the
    fractional-window index arithmetic of h5.py:158-175, 220-237);
  * per-window min-max timestamp normalization, polarity to ±1
    (base.py:71-99);
  * H/V/polarity flip augmentation with per-slot flags resampled on rollover
    (base.py:29-37, 54-69, 101-127) + flow-map augmentation (:144-159);
  * hot-pixel filtering with per-slot running event rates (base.py:237-256);
  * average-pool downsampling when resolution < std_resolution, with
    event-coordinate rescaling + clamping and the ``keep_gt_full_res``
    full-resolution GT path (h5.py:374-430);
  * spatially-filtered event reading (center crop in event space,
    h5.py:449-545).

TPU-first differences:
  * output batches are numpy NHWC dicts with *static-shape* padded event
    lists (``event_list [B, N, 4]`` + ``event_valid [B, N]``) — N is exact in
    'events' mode and bucketed (next power of two) otherwise, so jitted
    consumers see a handful of shapes at most;
  * sequence rollover is reported as data, not control flow: ``new_seq``
    flags per slot + a global flag, so the device step can mask-reset carries
    without retracing;
  * no torch DataLoader; a double-buffered prefetch thread overlaps host
    encoding with device compute (the reference runs num_workers=0).
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

try:
    # Registers the blosc/zstd HDF5 filters used by the standard
    # MVSEC-to-HDF5 conversion (the reference unconditionally imports it,
    # dataloader/h5.py:3). Optional here: synthetic/uncompressed files
    # need no filters; _read_dataset raises a pointed error if a
    # compressed file is opened without it.
    import hdf5plugin  # noqa: F401  (import registers the filters)
except ImportError:  # pragma: no cover
    hdf5plugin = None

from evflow.data import encodings as enc

__all__ = ["H5EventStream", "Prefetcher", "bucket_size"]


def bucket_size(n: int, minimum: int = 256) -> int:
    """Round up to the next power of two (shape-bucketing for jit)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _avg_pool(img: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """[H, W, C] average pooling with kernel=stride=(ph, pw)."""
    H, W, C = img.shape
    return img[: H - H % ph, : W - W % pw].reshape(
        H // ph, ph, W // pw, pw, C
    ).mean(axis=(1, 3))


@dataclass
class _TimedNames:
    """Dataset names + timestamps of a GT group (h5.py:17-44 visitor)."""

    names: List[str] = field(default_factory=list)
    ts: List[float] = field(default_factory=list)


def _collect_timed(group) -> _TimedNames:
    out = _TimedNames()

    def visit(name, obj):
        if hasattr(obj, "dtype") and name not in out.names:
            out.names.append(name)
            out.ts.append(obj.attrs["timestamp"])

    group.visititems(visit)
    return out


class H5EventStream:
    """Stateful multi-slot event stream (the reference H5Loader redesigned
    as a plain iterator producing full batches)."""

    def __init__(self, config: Dict[str, Any], num_bins: int, round_encoding: bool = False):
        if h5py is None:
            raise ImportError("h5py is required for H5EventStream")
        self.config = config
        self.num_bins = num_bins
        self.round_encoding = round_encoding
        self.mode = config["data"]["mode"]
        self.window = config["data"]["window"]
        loader = config["loader"]
        self.batch_size = int(loader.get("batch_size", 1))
        if self.mode == "events":
            self.resolution = tuple(loader["resolution"])
        else:
            self.resolution = tuple(loader.get("std_resolution", loader["resolution"]))
        self.target_resolution = tuple(loader["resolution"])
        self.std_resolution = tuple(loader.get("std_resolution", loader["resolution"]))
        self.keep_gt_full_res = bool(loader.get("keep_gt_full_res", False))
        self.augment = list(loader.get("augment", []))
        self.augment_prob = list(loader.get("augment_prob") or [])
        if self.augment and len(self.augment_prob) < len(self.augment):
            # default 0.5 per mechanism — also when augment_prob is present
            # but shorter/empty (the default_config ships an empty list,
            # which would otherwise silently disable augmentation via zip)
            self.augment_prob += [0.5] * (len(self.augment) - len(self.augment_prob))
        self.rng = np.random.default_rng(int(loader.get("seed", 0)))

        self.epoch = 0
        self.seq_num = 0
        self.samples = 0
        self.new_seq = False
        # per-slot last event timestamp: at B>1 each slot streams a different
        # file, so time-based consumers (vis store_interval throttling,
        # visualization.py:226-231) need slot-correct provenance
        self.slot_ts = np.zeros(self.batch_size, np.float64)

        # file inventory (recursive walk, h5.py:59-63)
        self.files: List[str] = []
        for root, _dirs, files in os.walk(config["data"]["path"]):
            for f in sorted(files):
                if f.endswith(".h5"):
                    self.files.append(os.path.join(root, f))
        if not self.files:
            raise FileNotFoundError(f"No .h5 files under {config['data']['path']}")

        # multi-host data parallelism (SURVEY §5.8): each host streams its own
        # round-robin shard of the sequence files — the multi-process analog
        # of the reference's per-batch-slot file assignment (h5.py:68-70).
        # Defaults to this process's jax identity; override via
        # loader.shard_index / loader.num_shards for tests or custom layouts.
        num_shards = loader.get("num_shards")
        shard_index = loader.get("shard_index")
        if num_shards is None or shard_index is None:
            try:
                import jax

                num_shards = jax.process_count()
                shard_index = jax.process_index()
            except Exception:
                num_shards, shard_index = 1, 0
        num_shards = int(num_shards)
        shard_index = int(shard_index)
        if num_shards > 1:
            shard_files = self.files[shard_index::num_shards]
            if not shard_files:
                raise ValueError(
                    f"Host shard {shard_index}/{num_shards} has no files "
                    f"({len(self.files)} total) — fewer sequences than hosts"
                )
            self.files = shard_files
        self.num_shards = num_shards
        self.shard_index = shard_index

        # per-open-file h5py handle/timestamp caches (see _events_ds /
        # _find_ts_index); ts arrays are cached up to this budget per file
        self._ds_cache: Dict[int, tuple] = {}
        self._ts_cache: Dict[int, np.ndarray] = {}
        self.ts_cache_bytes = int(loader.get("ts_cache_bytes", 256 << 20))
        # whole-file event-array cache (loader.event_cache_bytes, default
        # 1 GiB; 0 disables): files under the budget are read once into RAM
        # pre-cast (xs/ys/ps f32, ts f64 minus t0) so per-window reads are
        # O(1) slices instead of h5py dataset reads + casts. Keyed by PATH —
        # shared when several slots stream the same file and survives slot
        # rollovers. FIFO-evicted against the total budget.
        self._ev_cache: Dict[str, tuple] = {}
        self._ev_cache_used = 0
        self.event_cache_bytes = int(loader.get("event_cache_bytes", 1 << 30))

        # optional per-slot fetch fan-out (loader.fetch_workers > 1): each
        # batch slot's read+encode runs on a pool thread. Deterministic
        # except augmentation draw ORDER on concurrent rollovers (the
        # shared rng is lock-guarded, but thread arrival order varies).
        workers = int(loader.get("fetch_workers", 1))
        self._slot_lock = threading.Lock()
        self._pool = None
        if workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=min(workers, self.batch_size),
                thread_name_prefix="evflow-slot",
            )

        # per-slot state
        B = self.batch_size
        self.batch_idx = list(range(B))
        self.batch_row: List[float] = [0.0] * B
        self.open_files = []
        self.batch_last_ts = []
        self.slot_gt: List[Optional[_TimedNames]] = [None] * B
        self.slot_frames: List[Optional[_TimedNames]] = [None] * B
        self.slot_aug: List[Dict[str, bool]] = [dict() for _ in range(B)]

        hot = config.get("hot_filter", {})
        self.hot_enabled = bool(hot.get("enabled", False))
        self.hot_cfg = hot
        self.hot_idx = [0] * B
        self.hot_events = [np.zeros(self.resolution, np.float32) for _ in range(B)]

        # skip building the voxel encoding when the model config explicitly
        # selects counts — it is never read, and at serving rates the host
        # encode time matters (bilinear voxel is the most expensive encoder).
        # With no model config (bare-stream use) all encodings are built.
        model_cfg = config.get("model")
        # no model config at all (bare-stream use) -> build everything;
        # with a model config, "cnt" is the default encoding everywhere
        # (registry.py/train.py/eval.py), so an omitted key also skips
        model_enc = model_cfg.get("encoding", "cnt") if model_cfg else None
        self.build_voxel = (
            model_enc != "cnt" or bool(loader.get("build_all_encodings", False))
        )

        # temporal count mode (dataloader/base.py:280-308): channel 0 =
        # (pos-neg) of the current window, channel 1 = previous window's
        self.temporal_cnt = bool(config.get("model", {}).get("temporal_cnt", False))
        self.prev_cnt: List[Optional[np.ndarray]] = [None] * B

        for b in range(B):
            self._open_slot(b, self.files[b % len(self.files)])
            self._resample_aug(b)

        # native C++ encoder (native/evflow_host.cpp) with numpy fallback;
        # loader.fused_assembly: False keeps the native kernels but disables
        # the single-call ev_window_assemble fast path (ablation knob,
        # benchmarks/bench_loader.py)
        self._native = None
        self._fused_assembly = bool(loader.get("fused_assembly", True))
        if bool(loader.get("native_encoder", True)):
            try:
                from evflow.data.native import NativeEncoder

                self._native = NativeEncoder()
            except Exception:
                self._native = None

    # -- slot management ---------------------------------------------------

    def _open_slot(self, b: int, path: str):
        if len(self.open_files) > b:
            try:
                old = id(self.open_files[b])
                self._ds_cache.pop(old, None)
                self._ds_cache.pop((old, "gt"), None)
                self._ts_cache.pop(old, None)
                self.open_files[b].close()
            except Exception:
                pass
            self.open_files[b] = h5py.File(path, "r")
        else:
            self.open_files.append(h5py.File(path, "r"))
        f = self.open_files[b]
        try:
            # first actual data read: a blosc/zstd-compressed file (the
            # standard MVSEC conversion) fails HERE if its HDF5 filter
            # plugin is unregistered — surface the fix, not h5py's
            # opaque "required filter not available"
            last = f["events/ts"][-1] - f.attrs["t0"]
        except OSError as e:
            if hdf5plugin is None and "filter" in str(e).lower():
                raise OSError(
                    f"{path}: reading failed with an HDF5 filter error and "
                    "the 'hdf5plugin' package is not installed. Compressed "
                    "MVSEC-format files (blosc/zstd) need it: "
                    "pip install hdf5plugin"
                ) from e
            raise
        if len(self.batch_last_ts) > b:
            self.batch_last_ts[b] = last
        else:
            self.batch_last_ts.append(last)
        if self.mode in ("gtflow_dt1", "gtflow_dt4"):
            self.slot_gt[b] = _collect_timed(f[self.mode.replace("gtflow_", "flow_")])
        if self.mode == "frames":
            self.slot_frames[b] = _collect_timed(f["images"])

    def _resample_aug(self, b: int):
        for mech, prob in zip(self.augment, self.augment_prob):
            self.slot_aug[b][mech] = bool(self.rng.random() < prob)

    def _reset_sequence(self, b: int):
        """h5.py:255-283 + base.py:54-69. Lock-guarded: shared counters
        (seq_num, batch_idx max) and the augmentation rng must not race
        when fetch_workers > 1 roll two slots over concurrently."""
        with self._slot_lock:
            self.seq_num += 1
            self.batch_row[b] = 0.0
            self.batch_idx[b] = max(self.batch_idx) + 1
            self._open_slot(b, self.files[self.batch_idx[b] % len(self.files)])
            self._resample_aug(b)
            if self.hot_enabled:
                self.hot_idx[b] = 0
                self.hot_events[b] = np.zeros(self.resolution, np.float32)

    def shuffle(self, flag: bool = True):
        if flag:
            self.rng.shuffle(self.files)

    def get_iters(self, b: int) -> int:
        f = self.open_files[b]
        if self.mode == "events":
            it = len(f["events/xs"])
        elif self.mode == "time":
            it = f.attrs["duration"]
        elif self.mode == "frames":
            it = len(self.slot_frames[b].ts) - 1
        elif self.mode in ("gtflow_dt1", "gtflow_dt4"):
            it = len(self.slot_gt[b].ts) - 1
        else:
            raise ValueError(f"Unknown mode {self.mode!r}")
        return int(it // self.window)

    # -- event reading -----------------------------------------------------

    def _events_ds(self, f):
        """Cached h5py dataset handles + t0 per open file: re-resolving
        ``f["events/xs"]`` etc. every window costs more than the reads
        themselves at serving rates (measured ~58% of next_batch)."""
        c = self._ds_cache.get(id(f))
        if c is None:
            c = (f["events/xs"], f["events/ys"], f["events/ts"],
                 f["events/ps"], float(f.attrs["t0"]))
            self._ds_cache[id(f)] = c
        return c

    def _find_ts_index(self, f, timestamp: float) -> int:
        """bisect_left over events/ts. np.searchsorted on an h5py dataset
        would materialize the WHOLE array per call (two full reads per
        window in time/frames/gtflow modes) — instead cache the ts array
        once per open file when it fits the budget, else run an
        O(log n) dataset-probe bisect (the reference's
        binary_search_array, dataloader/encodings.py:9-27)."""
        dts = self._events_ds(f)[2]
        c = self._ts_cache.get(id(f))
        if c is None and dts.size * dts.dtype.itemsize <= self.ts_cache_bytes:
            c = dts[...]
            self._ts_cache[id(f)] = c
        if c is not None:
            return int(np.searchsorted(c, timestamp, side="left"))
        lo, hi = 0, dts.shape[0]
        while lo < hi:
            mid = (lo + hi) // 2
            if dts[mid] < timestamp:
                lo = mid + 1
            else:
                hi = mid
        return lo

    def _cached_events(self, f):
        """Whole-file pre-cast event arrays when the file fits the
        event-cache budget; None otherwise (falls back to dataset reads)."""
        path = f.filename
        c = self._ev_cache.get(path)
        if c is not None or self.event_cache_bytes <= 0:
            return c
        dxs, dys, dts, dps, t0 = self._events_ds(f)
        n = dxs.shape[0]
        nbytes = n * (4 + 4 + 8 + 4)
        if nbytes > self.event_cache_bytes:
            return None
        with self._slot_lock:
            c = self._ev_cache.get(path)
            if c is not None:
                return c
            while self._ev_cache and self._ev_cache_used + nbytes > self.event_cache_bytes:
                oldest = next(iter(self._ev_cache))  # dicts preserve insertion order
                self._ev_cache_used -= self._ev_cache.pop(oldest)[0]
            c = (
                nbytes,
                dxs[...].astype(np.float32),
                dys[...].astype(np.float32),
                dts[...].astype(np.float64) - t0,
                dps[...].astype(np.float32),
            )
            self._ev_cache[path] = c
            self._ev_cache_used += nbytes
        return c

    def _get_events(self, f, i0: int, i1: int):
        c = self._cached_events(f)
        if c is not None:
            _, cxs, cys, cts, cps = c
            # contiguous read-only views — every consumer (fused native
            # assembly, numpy formatting) copies before mutating
            return cxs[i0:i1], cys[i0:i1], cts[i0:i1], cps[i0:i1]
        dxs, dys, dts, dps, t0 = self._events_ds(f)
        xs = dxs[i0:i1].astype(np.float32)
        ys = dys[i0:i1].astype(np.float32)
        ts = dts[i0:i1].astype(np.float64) - t0
        ps = dps[i0:i1].astype(np.float32)
        return xs, ys, ts, ps

    def _event_index(self, b: int) -> Tuple[int, int]:
        """h5.py:138-175 window → event index mapping."""
        f = self.open_files[b]
        w = self.window
        row = self.batch_row[b]
        if self.mode == "events":
            return int(row), int(row + w)
        if self.mode == "time":
            t0 = f.attrs["t0"]
            return (
                self._find_ts_index(f, row + t0),
                self._find_ts_index(f, row + t0 + w),
            )
        timed = self.slot_frames[b] if self.mode == "frames" else self.slot_gt[b]
        i0 = int(np.floor(row))
        i1 = int(np.ceil(row + w))
        if w < 1.0 and i1 - i0 > 1:
            i0 += i1 - i0 - 1
        e0 = self._find_ts_index(f, timed.ts[i0])
        e1 = self._find_ts_index(f, timed.ts[i1])
        if w < 1.0:
            # fractional sub-window interpolation (h5.py:220-237)
            floor_row = int(np.floor(row))
            ceil_row = int(np.ceil(row + w))
            if ceil_row - floor_row > 1:
                floor_row += ceil_row - floor_row - 1
            c0 = row - floor_row
            c1 = row + w - floor_row
            delta = e1 - e0
            e1 = int(e0 + c1 * delta)
            e0 = int(e0 + c0 * delta)
        return e0, e1

    def _get_events_spatially_filtered(self, b: int, target_n: int):
        """Center-crop events in coordinate space, growing the read chunk
        until enough in-crop events are found (h5.py:449-545)."""
        f = self.open_files[b]
        sh, sw = self.std_resolution
        th, tw = self.target_resolution
        y0, x0 = (sh - th) // 2, (sw - tw) // 2
        y1, x1 = y0 + th, x0 + tw

        cur = int(self.batch_row[b])
        chunk = target_n * 2
        out = [[], [], [], []]
        collected, searched = 0, 0
        n_total = len(f["events/xs"])
        while collected < target_n and searched < target_n * 10:
            end = min(cur + chunk, n_total)
            if cur >= end:
                break
            xs = f["events/xs"][cur:end]
            ys = f["events/ys"][cur:end]
            ts = f["events/ts"][cur:end]
            ps = f["events/ps"][cur:end]
            m = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
            take = np.where(m)[0][: target_n - collected]
            if take.size:
                out[0].append(xs[take])
                out[1].append(ys[take])
                out[2].append(ts[take])
                out[3].append(ps[take])
                collected += take.size
            cur = end
            searched += chunk
            if collected < target_n * 0.5:
                chunk = min(chunk * 2, target_n * 5)
        if collected == 0:
            return (np.empty(0, np.float32),) * 4
        xs, ys, ts, ps = (np.concatenate(a) for a in out)
        xs = (xs - x0).astype(np.float32)
        ys = (ys - y0).astype(np.float32)
        ts = ts.astype(np.float64) - f.attrs["t0"]
        ps = ps.astype(np.float32)
        m = (ys >= 0) & (ys < th) & (xs >= 0) & (xs < tw)
        xs, ys, ts, ps = xs[m], ys[m], ts[m], ps[m]
        self.batch_row[b] = float(cur)
        return xs, ys, ts, ps

    # -- per-slot item (mirrors H5Loader.__getitem__, h5.py:184-447) -------

    def _slot_item(self, b: int) -> Tuple[Dict[str, np.ndarray], bool]:
        new_seq = False
        restarts = 0
        while True:
            if restarts > 2 * len(self.files):
                # every file rolled over without producing one window —
                # e.g. data.window larger than any sequence. Raise instead
                # of spinning through the file ring forever.
                raise ValueError(
                    f"no sequence can produce a window (mode={self.mode!r}, "
                    f"window={self.window}) — all {len(self.files)} files "
                    "are shorter than one window"
                )
            restart = False
            if self.mode in ("frames", "gtflow_dt1", "gtflow_dt4"):
                timed = self.slot_frames[b] if self.mode == "frames" else self.slot_gt[b]
                if int(np.ceil(self.batch_row[b] + self.window)) >= len(timed.ts):
                    restart = True

            xs = ys = ts = ps = np.empty(0, np.float32)
            if not restart:
                if self.mode == "events" and (
                    self.target_resolution[0] < self.std_resolution[0]
                    or self.target_resolution[1] < self.std_resolution[1]
                ):
                    # note: the filtered read moves batch_row to the consumed
                    # event index AND the trailing += window still applies,
                    # matching the reference exactly (h5.py:543 + :365)
                    xs, ys, ts, ps = self._get_events_spatially_filtered(
                        b, int(self.window)
                    )
                else:
                    i0, i1 = self._event_index(b)
                    xs, ys, ts, ps = self._get_events(self.open_files[b], i0, i1)

            if self.mode == "events" and xs.shape[0] < self.window:
                restart = True
            if (
                self.mode == "time"
                and self.batch_row[b] + self.window >= self.batch_last_ts[b]
            ):
                restart = True
            if xs.shape[0] <= 10:
                xs = ys = ts = ps = np.empty(0, np.float32)

            if restart:
                new_seq = True
                self.new_seq = True
                restarts += 1
                self._reset_sequence(b)
                continue

            H, W = self.resolution
            aug = self.slot_aug[b]
            if (self._native is not None and self._fused_assembly
                    and self._native.has_window_assemble()):
                # fused native path: formatting (base.py:71-99), flip
                # augmentation (:101-127) and every encoding in ONE pass
                # over the events — bit-identical to the split path below
                # (tests/test_native.py, test_h5_stream.py), ~2× host
                # throughput at 256² (benchmarks/bench_loader.py)
                try:
                    (event_cnt, event_mask, event_voxel, event_list,
                     pol_mask, dt_input, last_ts) = self._native.window_assemble(
                        xs, ys, ts, ps, (H, W), self.num_bins,
                        flip_h=bool(aug.get("Horizontal")),
                        flip_v=bool(aug.get("Vertical")),
                        flip_p=bool(aug.get("Polarity")),
                        build_voxel=self.build_voxel,
                        round_ts=self.round_encoding,
                    )
                except ValueError:
                    # corrupted-recording guard (base.py:90-98)
                    raise ValueError(
                        f"NaN/Inf event timestamps in "
                        f"{self.files[self.batch_idx[b] % len(self.files)]}"
                    )
                if ts.shape[0] > 0:
                    self.slot_ts[b] = last_ts
                if self.temporal_cnt:
                    curr = (event_cnt[..., 0] - event_cnt[..., 1])[..., None]
                    prev = self.prev_cnt[b]
                    if prev is None:
                        prev = np.zeros_like(curr)
                    event_cnt = np.concatenate([curr, prev], axis=-1)
                    self.prev_cnt[b] = curr.copy()
                return self._slot_finish(
                    b, event_cnt, event_voxel, event_mask, event_list,
                    pol_mask, dt_input, aug, new_seq,
                )

            # formatting (base.py:71-99): ps→±1, per-window min-max ts norm
            dt_input = float(ts[-1] - ts[0]) if ts.shape[0] > 0 else 0.0
            if ts.shape[0] > 0:
                self.slot_ts[b] = float(ts[-1])
            ps = ps * 2.0 - 1.0 if ps.size and ps.min() >= 0 else ps
            tsn = ts.astype(np.float64)
            if tsn.size and not np.isfinite(tsn).all():
                # corrupted-recording guard (base.py:90-98)
                raise ValueError(
                    f"NaN/Inf event timestamps in "
                    f"{self.files[self.batch_idx[b] % len(self.files)]}"
                )
            if tsn.size:
                rng = tsn.max() - tsn.min()
                tsn = (tsn - tsn.min()) / rng if rng > 0 else np.zeros_like(tsn)
            tsn = tsn.astype(np.float32)

            # augmentation (base.py:101-127)
            if aug.get("Horizontal"):
                xs = W - 1 - xs
            if aug.get("Vertical"):
                ys = H - 1 - ys
            if aug.get("Polarity"):
                ps = -ps

            # encodings (native C++ kernels when built, numpy otherwise)
            if self._native is not None:
                event_cnt = self._native.count_encoding(xs, ys, ps, (H, W))
                event_mask = self._native.mask_encoding(xs, ys, ps, (H, W))
                event_voxel = self._native.voxel_encoding(
                    xs, ys, tsn, ps, self.num_bins, (H, W), self.round_encoding
                ) if self.build_voxel else None
                pol_mask = (
                    self._native.polarity_mask(ps)
                    if ps.size
                    else np.zeros((0, 2), np.float32)
                )
            else:
                event_cnt = enc.np_events_to_channels(xs, ys, ps, (H, W))
                event_mask = enc.np_events_to_mask(xs, ys, ps, (H, W))
                event_voxel = enc.np_events_to_voxel(
                    xs, ys, tsn, ps, self.num_bins, (H, W), self.round_encoding
                ) if self.build_voxel else None
                pol_mask = (
                    enc.np_polarity_mask(ps)
                    if ps.size
                    else np.zeros((0, 2), np.float32)
                )
            event_list = np.stack([tsn, ys, xs, ps], axis=-1) if xs.size else np.zeros((0, 4), np.float32)

            if self.temporal_cnt:
                curr = (event_cnt[..., 0] - event_cnt[..., 1])[..., None]
                prev = self.prev_cnt[b]
                if prev is None:
                    prev = np.zeros_like(curr)
                event_cnt = np.concatenate([curr, prev], axis=-1)
                self.prev_cnt[b] = curr.copy()

            return self._slot_finish(
                b, event_cnt, event_voxel, event_mask, event_list,
                pol_mask, dt_input, aug, new_seq,
            )

    def _slot_finish(self, b, event_cnt, event_voxel, event_mask, event_list,
                     pol_mask, dt_input, aug, new_seq):
        """Per-window tail shared by the fused-native and split encode paths:
        hot-pixel filtering, frames/GT-flow reads, cursor advance, dict
        assembly and the downsampling path (h5.py:327-430)."""
        # hot pixel removal (h5.py:327-333)
        if self.hot_enabled:
            hot_update = (event_cnt.sum(-1) > 0).astype(np.float32)
            self.hot_events[b] += hot_update
            self.hot_idx[b] += 1
            rate = self.hot_events[b] / self.hot_idx[b]
            hot_mask = enc.np_hot_event_mask(
                rate.copy(),
                self.hot_idx[b],
                max_px=int(self.hot_cfg.get("max_px", 100)),
                min_obvs=int(self.hot_cfg.get("min_obvs", 5)),
                max_rate=float(self.hot_cfg.get("max_rate", 0.8)),
            )
            event_cnt *= hot_mask[..., None]
            if event_voxel is not None:
                event_voxel *= hot_mask[..., None]
            event_mask *= hot_mask[..., None]
        else:
            hot_mask = None

        # frames (h5.py:336-347)
        frames = None
        if self.mode == "frames":
            timed = self.slot_frames[b]
            c = int(np.floor(self.batch_row[b]))
            n = int(np.ceil(self.batch_row[b] + self.window))
            img0 = self.open_files[b]["images"][timed.names[c]][:]
            img1 = self.open_files[b]["images"][timed.names[n]][:]
            def aug_frame(img):
                if aug.get("Horizontal"):
                    img = np.flip(img, 1)
                if aug.get("Vertical"):
                    img = np.flip(img, 0)
                return img
            frames = np.stack([aug_frame(img0), aug_frame(img1)], axis=-1)

        # GT flow (h5.py:350-362); stored [2, H, W] → NHWC
        gtflow = None
        dt_gt = 0.0
        if self.mode in ("gtflow_dt1", "gtflow_dt4"):
            timed = self.slot_gt[b]
            idx = int(np.ceil(self.batch_row[b] + self.window))
            f = self.open_files[b]
            grp = self._ds_cache.get((id(f), "gt"))
            if grp is None:
                grp = f[self.mode.replace("gtflow_", "flow_")]
                self._ds_cache[(id(f), "gt")] = grp
            fm = grp[timed.names[idx]][:]
            if fm.ndim == 3 and fm.shape[0] == 2:
                fm = np.moveaxis(fm, 0, -1)  # [H, W, 2] (x, y)
            # flow augmentation (base.py:144-159)
            if aug.get("Horizontal"):
                fm = np.flip(fm, 1).copy()
                fm[..., 0] *= -1.0
            if aug.get("Vertical"):
                fm = np.flip(fm, 0).copy()
                fm[..., 1] *= -1.0
            gtflow = fm.astype(np.float32)
            if idx > 0:
                dt_gt = float(timed.ts[idx] - timed.ts[idx - 1])

        self.batch_row[b] += self.window

        out = {
            "event_cnt": event_cnt,
            # when the voxel encoding is skipped (cnt model), alias counts so
            # consumers that forward batch["event_voxel"] blindly (the model
            # ignores it) see a well-formed array with zero extra host work
            "event_voxel": event_voxel if event_voxel is not None else event_cnt,
            "event_mask": event_mask,
            "event_list": event_list,
            "event_list_pol_mask": pol_mask,
            "dt_input": np.float32(dt_input),
            "dt_gt": np.float32(dt_gt),
        }
        if hot_mask is not None:
            # exported so a compact wire can derive event_cnt on device from
            # the (unfiltered) event list: cnt == histogram(events) * hot.
            # The filter zeroes count/mask PIXELS but never drops events from
            # event_list (matching h5.py:327-333) — consumers that rebuild
            # counts from the list need this mask; it rides as packed bits
            # (W/8 bytes/row), ~1/650th of the count grid it replaces.
            out["hot_mask"] = hot_mask.astype(np.uint8)
        if frames is not None:
            out["frames"] = frames
        if gtflow is not None:
            out["gtflow"] = gtflow

        # downsampling path (h5.py:374-430)
        th, tw = self.target_resolution
        oh, ow = out["event_cnt"].shape[:2]
        if th < oh or tw < ow:
            ph, pw = oh // th, ow // tw
            if ph == 0 or pw == 0:
                raise ValueError(f"Invalid pooling kernel ({ph}, {pw})")
            out["event_cnt"] = _avg_pool(out["event_cnt"], ph, pw)
            out["event_voxel"] = (
                _avg_pool(out["event_voxel"], ph, pw)
                if event_voxel is not None else out["event_cnt"]
            )
            if not self.keep_gt_full_res:
                out["event_mask"] = _avg_pool(out["event_mask"], ph, pw)
            if out["event_list"].size:
                el = out["event_list"].copy()
                el[:, 1] = np.clip(el[:, 1] * (th / oh), 0, th - 1)
                el[:, 2] = np.clip(el[:, 2] * (tw / ow), 0, tw - 1)
                out["event_list"] = el
            if "gtflow" in out and not self.keep_gt_full_res:
                out["gtflow"] = _avg_pool(out["gtflow"], ph, pw)
            if "frames" in out:
                cy, cx = (oh - th) // 2, (ow - tw) // 2
                out["frames"] = out["frames"][cy : cy + th, cx : cx + tw]

        return out, new_seq

    # -- batching ----------------------------------------------------------

    def next_batch(self) -> Dict[str, np.ndarray]:
        """Produce one stacked batch with static-shape padded event lists.

        Extra keys vs. the reference collate (base.py:261-278):
          event_valid [B, N] float padding mask;
          new_seq [B] per-slot rollover flags (a slot that rolled over this
          step starts a fresh sequence — consumers mask-reset its carry);
          epoch_done: python bool, seq_num: python int.
        """
        if self._pool is not None and self.batch_size > 1:
            # per-slot fan-out: slots stream independent files; HDF5 calls
            # serialize on h5py's internal lock, but the numpy/native
            # encode work releases the GIL. Rollover bookkeeping (shared
            # rng/seq counters) is guarded by _slot_lock in _reset_sequence.
            results = list(self._pool.map(self._slot_item,
                                          range(self.batch_size)))
            items = [r[0] for r in results]
            flags = [r[1] for r in results]
        else:
            items = []
            flags = []
            for b in range(self.batch_size):
                item, ns = self._slot_item(b)
                items.append(item)
                flags.append(ns)

        n_max = max(it["event_list"].shape[0] for it in items)
        if self.mode == "events":
            n_pad = max(int(self.window), 1)
        else:
            n_pad = bucket_size(max(n_max, 1))

        batch: Dict[str, Any] = {}
        for key in items[0]:
            if key in ("event_list", "event_list_pol_mask"):
                continue
            batch[key] = np.stack([it[key] for it in items])

        B = self.batch_size
        el = np.zeros((B, n_pad, 4), np.float32)
        pm = np.zeros((B, n_pad, 2), np.float32)
        va = np.zeros((B, n_pad), np.float32)
        for b, it in enumerate(items):
            n = min(it["event_list"].shape[0], n_pad)
            el[b, :n] = it["event_list"][:n]
            pm[b, :n] = it["event_list_pol_mask"][:n]
            va[b, :n] = 1.0
        batch["event_list"] = el
        batch["event_list_pol_mask"] = pm
        batch["event_valid"] = va
        batch["new_seq"] = np.array(flags, np.bool_)
        batch["epoch_done"] = self.seq_num >= len(self.files)
        batch["seq_num"] = self.seq_num
        # per-slot provenance, stamped at production time: consumers behind a
        # Prefetcher must not read the live cursors (they run ahead)
        batch["file_names"] = [
            os.path.basename(self.files[self.batch_idx[b] % len(self.files)])
            for b in range(self.batch_size)
        ]
        batch["ts"] = self.slot_ts.copy()  # [B] per-slot last event timestamp
        if batch["epoch_done"]:
            # roll the sequence cursor producer-side so a Prefetcher worker can
            # keep streaming the next epoch before the consumer reacts to the
            # epoch_done flag (which rides in the batch itself)
            self.seq_num = self.seq_num % len(self.files)
        return batch

    def end_epoch(self):
        """Consumer-side epoch bookkeeping (train_flow.py:216-219). The
        sequence cursor itself rolls inside ``next_batch`` so that prefetch
        threads can run ahead of the consumer."""
        self.epoch += 1
        self.samples = 0

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=True)
            self._pool = None
        for f in self.open_files:
            try:
                f.close()
            except Exception:
                pass


class Prefetcher:
    """Double-buffered background prefetch of ``next_batch`` results —
    overlaps host HDF5 reads + encodings with device compute."""

    def __init__(self, stream: H5EventStream, depth: int = 2):
        self.stream = stream
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._dead: Optional[Exception] = None
        self.t = threading.Thread(target=self._worker, daemon=True)
        self.t.start()

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch = self.stream.next_batch()
            except Exception as e:  # surface in consumer
                self.q.put(e)
                return
            self.q.put(batch)

    def __iter__(self):
        return self

    def __next__(self):
        if self._dead is not None:
            raise RuntimeError(
                f"prefetch worker died: {self._dead!r}"
            ) from self._dead
        item = self.q.get()
        if isinstance(item, Exception):
            # the worker exits after enqueueing the error — mark dead so a
            # consumer that retries doesn't block forever on an unfed queue
            self._dead = item
            raise item
        return item

    def close(self):
        """Stop and JOIN the worker before returning, so callers can close
        the underlying HDF5 files without racing an in-flight
        ``next_batch`` (h5py is not safe against concurrent close)."""
        self._stop.set()
        # drain until the worker exits — it may be blocked on q.put
        while self.t.is_alive():
            try:
                self.q.get(timeout=0.05)
            except queue.Empty:
                pass
            self.t.join(timeout=0.05)
        # leftover buffered batches
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
